

def test_iou_dice_batch_matches_host():
    """Accelerator even-odd raster == geometry.iou_and_dice per curve."""
    import numpy as np

    from hint_tpu.data import geometry
    from hint_tpu.evaluation import shape_fit

    rng = np.random.default_rng(3)
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    curves, outls = [], []
    for i in range(3):
        r1 = 1.0 + 0.2 * rng.standard_normal()
        curves.append(np.stack([r1 * np.cos(t), r1 * np.sin(t)], 1).astype(np.float32))
        r2 = 1.0 + 0.2 * rng.standard_normal()
        outls.append(np.stack([r2 * np.cos(t) + 0.1, r2 * np.sin(t)], 1).astype(np.float32))
    curves, outls = np.stack(curves), np.stack(outls)
    iou_b, dice_b = shape_fit.iou_and_dice_batch(outls, curves, chunk=2)
    for j in range(3):
        iou_h, dice_h = geometry.iou_and_dice(outls[j], curves[j])
        assert abs(iou_b[j] - iou_h) < 1e-3
        assert abs(dice_b[j] - dice_h) < 1e-3


def test_batch_ransac_matches_sklearn_estimator():
    """The vectorized batch RANSAC (one numpy pass over all curves) agrees
    with the per-curve sklearn estimator it replaces on unambiguous bars:
    same line, same angle, modulo the pi-flip the restart fitter covers."""
    import numpy as np

    from hint_tpu.evaluation import shape_fit

    rng = np.random.default_rng(7)
    curves = []
    for _ in range(8):
        ang = rng.uniform(-1.2, 1.2)  # dominant bar, slope well-defined
        t = np.linspace(-1, 1, 80)
        bar = np.stack([t * np.cos(ang), t * np.sin(ang)], 1)
        bar += 0.02 * rng.standard_normal(bar.shape)
        # cross-bar outliers RANSAC must reject
        s = np.linspace(-0.4, 0.4, 20)
        cross = np.stack([-s * np.sin(ang), s * np.cos(ang)], 1)
        curves.append(np.concatenate([bar, cross]).astype(np.float32))
    curves = np.stack(curves)
    a_sk = np.array([shape_fit.dominant_angle_ransac(c) for c in curves])
    a_np = shape_fit.dominant_angles_ransac_batch(curves)
    diff = np.abs(((a_sk - a_np + np.pi / 2) % np.pi) - np.pi / 2)
    assert np.degrees(diff).max() < 3.0, np.degrees(diff)
