"""Config system tests (parity with reference data/config.py presets)."""

from planerecnet_tpu.config import (PlaneRecNet_50_config,
                                    PlaneRecNet_101_config,
                                    PlaneRecNet_base_config, get_cfg,
                                    set_dataset)


def test_preset_lookup():
    cfg = get_cfg("PlaneRecNet_50_config")
    assert cfg.name == "PlaneRecNet_50"
    assert cfg.backbone.name == "ResNet50_DCNv2"
    assert cfg.backbone.layers == (3, 4, 6, 3)
    assert cfg.backbone.dcn_layers == (0, 4, 6, 3)
    assert cfg.backbone.dcn_interval == 1


def test_101_preset():
    cfg = get_cfg("PlaneRecNet_101_config")
    assert cfg.backbone.dcn_layers == (0, 4, 23, 3)
    assert cfg.backbone.dcn_interval == 3
    assert cfg.solov2.num_grids == (40, 36, 24, 16)
    assert cfg.solov2.num_kernels == 128
    assert cfg.solov2.instance_channels == 256
    assert cfg.solov2.num_instance_convs == 3
    assert cfg.use_lava_loss and cfg.use_plane_loss
    assert cfg.fpn.high_level_mode is None


def test_base_preset():
    cfg = PlaneRecNet_base_config
    assert cfg.solov2.num_grids == (40, 36, 24, 16, 12)
    assert cfg.solov2.instance_channels == 512
    assert cfg.fpn.high_level_mode == "original"
    assert cfg.num_classes == 2


def test_copy_is_functional():
    cfg = PlaneRecNet_50_config
    cfg2 = cfg.copy(dict(max_iter=10))
    assert cfg2.max_iter == 10 and cfg.max_iter == 125000
    # hashable (usable as a jit static arg)
    hash(cfg2)


def test_solov2_replace_surface():
    """Mirrors eval.py's cfg.solov2.replace(nms overrides)
    (reference eval.py:377-384)."""
    cfg = PlaneRecNet_50_config
    new_solo = cfg.solov2.copy(dict(nms_type="mask", score_thr=0.3))
    cfg2 = cfg.copy(dict(solov2=new_solo))
    assert cfg2.solov2.nms_type == "mask"
    assert cfg.solov2.nms_type == "matrix"


def test_set_dataset():
    cfg = set_dataset(PlaneRecNet_50_config, "nyu_eval")
    assert cfg.dataset.name == "NYUDataset"
    assert not cfg.dataset.has_pos


def test_tpu_compile_cache_gated_off_on_cpu():
    """enable_tpu_compile_cache must be a no-op off-TPU: reloading the
    remote-compile service's CPU AOT artifacts SIGILLs this host, so the
    helper gates on the backend actually being TPU (utils/utils.py)."""
    import jax

    from planerecnet_tpu.utils.utils import enable_tpu_compile_cache

    assert not enable_tpu_compile_cache()
    assert jax.config.jax_compilation_cache_dir is None


def test_tpu_compiler_options_parsing_and_cpu_gate(monkeypatch):
    """PRN_TPU_COMPILER_OPTIONS parses to a dict but is gated OFF off-TPU
    (the CPU compiler rejects TPU-only flag names); jit_kwargs() splats to
    {} so default jits are byte-identical (utils/utils.py)."""
    from planerecnet_tpu.utils import utils as u

    monkeypatch.delenv("PRN_TPU_COMPILER_OPTIONS", raising=False)
    assert u.tpu_compiler_options() == {}
    assert u.jit_kwargs() == {}

    monkeypatch.setenv("PRN_TPU_COMPILER_OPTIONS",
                       "xla_tpu_scoped_vmem_limit_kib=65536, foo=bar")
    # Backend here is CPU (conftest forces it): still {}.
    assert u.tpu_compiler_options() == {}

    # The parsing itself, with the backend gate bypassed.
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert u.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536", "foo": "bar"}
    assert u.jit_kwargs() == {"compiler_options": {
        "xla_tpu_scoped_vmem_limit_kib": "65536", "foo": "bar"}}
