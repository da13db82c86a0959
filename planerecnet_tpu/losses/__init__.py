from planerecnet_tpu.losses.losses import (  # noqa: F401
    adjoint_resize,
    center_of_mass,
    compute_gradient_map,
    compute_losses,
    dice_loss,
    prepare_ground_truth,
    rmse_log_loss,
    sigmoid_focal_loss,
)
from planerecnet_tpu.losses.vnl import (  # noqa: F401
    vnl_loss_ori,
    vnl_loss_single,
)
