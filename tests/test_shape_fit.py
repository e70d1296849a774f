

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
