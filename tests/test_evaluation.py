"""Evaluation-metric tests against independent scalar oracles."""

import numpy as np

from planerecnet_tpu.config import PlaneRecNet_50_config
from planerecnet_tpu.evaluation import (APDataObject, IOU_THRESHOLDS,
                                        bbox_iou, calc_map,
                                        compute_depth_metrics,
                                        compute_segmentation_metrics,
                                        make_ap_data, mask_iou)


def test_bbox_iou_known():
    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], np.float64)
    iou = bbox_iou(a, b)
    assert iou[0, 0] == 25 / 175
    assert iou[0, 1] == 0


def test_mask_iou_known():
    m1 = np.zeros((1, 8, 8))
    m1[0, :4] = 1
    m2 = np.zeros((2, 8, 8))
    m2[0, 2:6] = 1
    m2[1, 6:] = 1
    iou = mask_iou(m1, m2)
    assert iou[0, 0] == 16 / 48
    assert iou[0, 1] == 0


def test_depth_metrics_perfect():
    cfg = PlaneRecNet_50_config
    gt = np.full((10, 10), 2.0)
    m = compute_depth_metrics(gt, gt, cfg)
    abs_rel, sq_rel, rmse, log10, a1, a2, a3, ratio = m
    assert abs_rel == 0 and rmse == 0 and log10 == 0
    assert a1 == a2 == a3 == 1
    assert ratio == 1


def test_depth_metrics_offset():
    cfg = PlaneRecNet_50_config
    gt = np.full((4, 4), 2.0)
    pred = np.full((4, 4), 2.2)
    m = compute_depth_metrics(pred, gt, cfg)
    assert abs(m[0] - 0.1) < 1e-9          # abs_rel
    assert abs(m[2] - 0.2) < 1e-9          # rmse
    assert m[4] == 1.0                      # a1: ratio 1.1 < 1.25
    # validity mask: values below 0.5 are excluded
    gt2 = gt.copy()
    gt2[0, 0] = 0.1
    m2 = compute_depth_metrics(pred, gt2, cfg)
    assert np.isfinite(m2).all()


def test_ap_perfect_detection():
    ap = APDataObject()
    ap.add_gt_positives(2)
    ap.push(0.9, True)
    ap.push(0.8, True)
    assert ap.get_ap() == 1.0


def test_segmentation_metrics_quirk_parity():
    """The reference pushes a FP datapoint for every prediction, even matched
    ones (eval.py:240-248). With a single perfect prediction the PR points
    are (r=1, p=1) then (r=1, p=0.5); the left-searchsorted 101-point
    interpolation picks the first point at every recall, so AP stays 1.0 —
    the quirk only degrades AP when later detections follow."""
    ap_data = make_ap_data()
    gt_masks = np.zeros((1, 16, 16))
    gt_masks[0, 2:10, 2:10] = 1
    gt_boxes = np.array([[2, 2, 10, 10]], np.float64)
    gt_classes = np.array([0])
    compute_segmentation_metrics(
        ap_data, gt_masks, gt_boxes, gt_classes,
        pred_masks=gt_masks.copy(), pred_boxes=gt_boxes.copy(),
        pred_classes=np.array([0]), pred_scores=np.array([0.9]))
    ap50 = ap_data["mask"][0].get_ap()
    assert ap50 == 1.0
    maps = calc_map(ap_data, print_table=False)
    assert set(maps) == {"box", "mask"}
    assert maps["mask"][50] == round(ap50 * 100, 2)

    # Scalar oracle of the full reference walk for a 2-pred case where the
    # quirk bites: pred A matches (iou 1.0), pred B misses. Data points desc:
    # (0.9,T),(0.9,F),(0.3,F) -> precisions [1, .5, 1/3], recalls [1, 1, 1]
    # -> interpolated AP still 1.0; but with an unmatched HIGHER-scoring pred
    # first: (0.95,F),(0.9,T),(0.9,F) -> precisions [0, .5, 1/3],
    # recalls [0, 1, 1] -> smoothing gives [0.5, 0.5, 1/3]; bars at r=0 get
    # 0.5 and r>0 get 0.5 -> AP = 0.5.
    ap_data2 = make_ap_data()
    gt_masks = np.zeros((1, 16, 16))
    gt_masks[0, 2:10, 2:10] = 1
    gt_boxes = np.array([[2, 2, 10, 10]], np.float64)
    miss = np.zeros((1, 16, 16))
    miss[0, 12:16, 12:16] = 1
    compute_segmentation_metrics(
        ap_data2, gt_masks, gt_boxes, np.array([0]),
        pred_masks=np.concatenate([miss, gt_masks]),
        pred_boxes=np.array([[12, 12, 16, 16], [2, 2, 10, 10]], np.float64),
        pred_classes=np.array([0, 0]), pred_scores=np.array([0.95, 0.9]))
    assert abs(ap_data2["mask"][0].get_ap() - 0.5) < 1e-9


def test_moving_average_and_savepath(tmp_path):
    from planerecnet_tpu.utils import MovingAverage, SavePath

    ma = MovingAverage(3)
    for v in [1.0, 2.0, float("nan"), 3.0, 4.0]:
        ma.add(v)
    assert ma.get_avg() == 3.0  # window [2,3,4]

    sp = SavePath("PlaneRecNet_50", 3, 12500)
    p = sp.get_path(str(tmp_path))
    assert p.endswith("PlaneRecNet_50_3_12500.npz")
    back = SavePath.from_str(p)
    assert (back.model_name, back.epoch, back.iteration) == \
        ("PlaneRecNet_50", 3, 12500)

    open(p, "w").close()
    open(str(tmp_path / "PlaneRecNet_50_4_25000.npz"), "w").close()
    latest = SavePath.get_latest(str(tmp_path), "PlaneRecNet_50")
    assert latest.endswith("_4_25000.npz")


def test_timer_scopes():
    import time
    from planerecnet_tpu.utils import timer

    timer.enable_all()  # another test's CLI run may have disabled timing
    timer.reset()
    with timer.env("outer"):
        time.sleep(0.01)
        with timer.env("inner"):
            time.sleep(0.02)
        time.sleep(0.01)
    total = timer.total_time()
    # Generous upper bound: time.sleep oversleeps hugely on a loaded
    # single-core CI host; the test is about scope accounting, not latency.
    assert 0.035 < total < 5.0
    # nested scope does not double count
    assert timer._total_times["inner"] < timer._total_times["outer"] + 0.02
