"""Trainer tests: torch-parity optimizer, LR schedule, loss decrease,
checkpoint round-trip, conditional training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hint_tpu.models import builders
from hint_tpu.train import checkpoint
from hint_tpu.train.optim import (
    ADAM_EPS,
    GRAD_CLAMP,
    apply_updates,
    init_trainables,
    lr_schedule,
    make_optimizer,
)
from hint_tpu.train.trainer import CONDITIONAL_CINN, CONDITIONAL_HINT, UNCONDITIONAL, Trainer

KEY = jax.random.PRNGKey(0)


def test_lr_schedule():
    # warmup epochs at lr_init * 3e-2; then lr_init * final_decay^(e/n)
    lr0 = float(lr_schedule(0, 0.01, 3, 0.01, 50))
    assert lr0 == pytest.approx(0.01 * 3e-2)
    lr3 = float(lr_schedule(3, 0.01, 3, 0.01, 50))
    assert lr3 == pytest.approx(0.01 * 0.01 ** (3 / 50), rel=1e-5)
    lr49 = float(lr_schedule(49, 0.01, 3, 0.01, 50))
    assert lr49 == pytest.approx(0.01 * 0.01 ** (49 / 50), rel=1e-5)


def _torch_reference_lr_trace(lr_init, pre_low_lr, final_decay, n_epochs):
    """Run the reference's exact warmup-mutation + StepLR loop
    (/root/reference/train_unconditional.py:174-178,191-193,201) under the
    *installed* torch, recording the lr each epoch actually trains with."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([p], lr=lr_init)
    sched = torch.optim.lr_scheduler.StepLR(
        optim, step_size=1, gamma=final_decay ** (1.0 / n_epochs)
    )
    lrs = []
    for e in range(n_epochs):
        if e < pre_low_lr:
            for group in optim.param_groups:
                group["lr"] = lr_init * 3e-2
        lrs.append(optim.param_groups[0]["lr"])
        optim.step()  # silence the step-order warning; no grads -> no-op
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize("pre_low_lr", [0, 3])
def test_lr_modern_matches_installed_torch_steplr(pre_low_lr):
    """semantics='modern' must reproduce the reference loop as it executes
    under torch >= 1.4 chainable schedulers (the installed torch): StepLR
    multiplies the *current* (warmup-mutated) lr, so post-warmup lr continues
    from lr_init*3e-2, ~28x below the closed form."""
    torch_lrs = _torch_reference_lr_trace(0.01, pre_low_lr, 0.01, 50)
    ours = np.asarray(
        [float(lr_schedule(e, 0.01, pre_low_lr, 0.01, 50, "modern")) for e in range(50)]
    )
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5)


def test_lr_legacy_matches_torch_closed_form():
    """semantics='legacy' is the torch-1.x StepLR closed form
    lr_init * gamma^e, which old StepLR recomputed from base_lr every epoch
    (overwriting the warmup mutation). Under installed torch the same closed
    form is produced by the loop *without* the warmup mutation."""
    torch_lrs = _torch_reference_lr_trace(0.01, 0, 0.01, 50)  # no mutation
    ours = np.asarray(
        [float(lr_schedule(e, 0.01, 3, 0.01, 50, "legacy")) for e in range(50)]
    )
    # post-warmup epochs follow the closed form exactly
    np.testing.assert_allclose(ours[3:], torch_lrs[3:], rtol=1e-5)
    # warmup epochs use the mutated low lr (train_unconditional.py:193)
    np.testing.assert_allclose(ours[:3], 0.01 * 3e-2, rtol=1e-6)


def test_lr_semantics_coincide_without_warmup():
    for e in range(10):
        a = float(lr_schedule(e, 0.01, 0, 0.01, 50, "legacy"))
        b = float(lr_schedule(e, 0.01, 0, 0.01, 50, "modern"))
        assert a == pytest.approx(b, rel=1e-6)


def test_lr_semantics_rejects_unknown():
    with pytest.raises(ValueError):
        lr_schedule(0, 0.01, 3, 0.01, 50, "torch3000")


def test_adam_matches_torch():
    """Our masked Adam must reproduce torch.optim.Adam(weight_decay=...) with
    the reference's grad clamp, to float32 tolerance over 25 steps
    (train_unconditional.py:137-144,174-176)."""
    import torch

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    lr, betas, wd = 1e-2, (0.9, 0.95), 1.86e-5

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, betas=betas, eps=ADAM_EPS, weight_decay=wd)
    grads = [rng.randn(4, 3).astype(np.float32) * 3 for _ in range(25)]
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        wt.grad.data.clamp_(-GRAD_CLAMP, GRAD_CLAMP)
        opt.step()

    # jax side
    params = {"w": jnp.asarray(w0)}
    mask = {"w": True}
    opt_init, opt_update = make_optimizer(betas, wd, mask)
    state = opt_init(params)
    for g in grads:
        updates, state = opt_update({"w": jnp.asarray(g)}, state, params, lr)
        params = apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), atol=2e-6, rtol=1e-5
    )


def test_mask_freezes_leaves():
    params = {"a": jnp.ones(3), "q_fixed": jnp.ones(3)}
    mask = {"a": True, "q_fixed": False}
    opt_init, opt_update = make_optimizer((0.9, 0.95), 0.0, mask)
    state = opt_init(params)
    g = {"a": jnp.ones(3), "q_fixed": jnp.ones(3)}
    updates, state = opt_update(g, state, params, 0.1)
    assert float(jnp.abs(updates["q_fixed"]).max()) == 0.0
    assert float(jnp.abs(updates["a"]).max()) > 0.0


def test_init_trainables_overwrites_only_trainables():
    m = builders.hint(dim=8, n_blocks=2, c_internal=(8,), perm_fixed=True)
    params = m.init(KEY)
    mask = m.trainable_mask(params)
    q_before = np.asarray(params["b1"]["q_fixed"])
    new = init_trainables(params, mask, jax.random.PRNGKey(1), 0.005)
    np.testing.assert_allclose(np.asarray(new["b1"]["q_fixed"]), q_before)
    w = np.asarray(new["b0"]["L0"]["w0"])
    assert abs(w.std() - 0.005) < 0.003  # ~init_scale-scaled normal


def _toy_gaussian_data(key, n, dim, scale=2.0):
    x = scale * jax.random.normal(key, (n, dim))
    return np.asarray(x), None


def test_training_reduces_loss_unconditional():
    dim = 6
    m = builders.hint(dim=dim, n_blocks=2, c_internal=(16, 8))
    tr = Trainer(
        model=m, kind=UNCONDITIONAL, n_epochs=8, batch_size=256, max_batches_per_epoch=8,
        lr_init=0.01, pre_low_lr=1, init_scale=0.005, l2_weight_reg=1.86e-5,
    )
    x, _ = _toy_gaussian_data(jax.random.PRNGKey(2), 4096, dim)
    state = tr.init_state(jax.random.PRNGKey(3))
    first = tr.eval_epoch(state.params, jnp.asarray(x), None, jax.random.PRNGKey(4))
    for e in range(tr.n_epochs):
        state, _ = tr.train_epoch(state, jnp.asarray(x), None, jax.random.PRNGKey(10 + e), e)
    last = tr.eval_epoch(state.params, jnp.asarray(x), None, jax.random.PRNGKey(5))
    assert last.sum() < first.sum() - 0.5, (first, last)


def test_training_conditional_hint_runs():
    m = builders.conditional_hint(
        dim_x=8, dim_y=2, n_blocks=2, c_internal=(8, 4), hidden_external=8, hidden_y=8
    )
    tr = Trainer(model=m, kind=CONDITIONAL_HINT, n_epochs=2, batch_size=128,
                 max_batches_per_epoch=4, pre_low_lr=0)
    x = np.random.RandomState(0).randn(512, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(512, 2).astype(np.float32)
    state, final = tr.fit(
        jax.random.PRNGKey(6), (jnp.asarray(x), jnp.asarray(y)), (jnp.asarray(x), jnp.asarray(y))
    )
    assert np.isfinite(final)


def test_training_cinn_runs():
    m = builders.cinn(dim=8, cond_dim=2, n_blocks=2, hidden=16)
    tr = Trainer(model=m, kind=CONDITIONAL_CINN, n_epochs=2, batch_size=128,
                 max_batches_per_epoch=4, pre_low_lr=0)
    x = np.random.RandomState(0).randn(512, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(512, 2).astype(np.float32)
    state, final = tr.fit(
        jax.random.PRNGKey(7), (jnp.asarray(x), jnp.asarray(y)), (jnp.asarray(x), jnp.asarray(y))
    )
    assert np.isfinite(final)


def test_checkpoint_roundtrip(tmp_path):
    m = builders.hint(dim=6, n_blocks=2, c_internal=(8,))
    tr = Trainer(model=m, kind=UNCONDITIONAL, batch_size=64, max_batches_per_epoch=2, n_epochs=1)
    state = tr.init_state(jax.random.PRNGKey(8))
    x = jnp.asarray(np.random.RandomState(2).randn(128, 6).astype(np.float32))
    state, _ = tr.train_epoch(state, x, None, jax.random.PRNGKey(9), 0)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_npz(path, state)
    template = tr.init_state(jax.random.PRNGKey(10))
    restored = checkpoint.load_npz(path, template)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt.mu), jax.tree.leaves(restored.opt.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.opt.step) == int(state.opt.step)


def test_weights_only_checkpoint(tmp_path):
    m = builders.inn(dim=6, n_blocks=1, hidden=8)
    params = m.init(KEY)
    path = str(tmp_path / "w.npz")
    checkpoint.save_params_npz(path, params)
    restored = checkpoint.load_params_npz(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted():
    """Train 4 epochs straight vs 2 epochs + checkpoint + resume: identical
    final params (exact mid-training resume, which the reference lacks)."""
    import jax
    import jax.numpy as jnp

    from hint_tpu.models import builders
    from hint_tpu.train.trainer import Trainer

    def make():
        model = builders.inn(6, 1, 8)
        return Trainer(model=model, kind="unconditional", n_epochs=4,
                       batch_size=16, max_batches_per_epoch=2, pre_low_lr=1)

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 6))
    xt = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    key = jax.random.PRNGKey(42)

    t1 = make()
    s_full, _ = t1.fit(key, (x, None), (xt, None))

    t2 = make()
    halves = {}

    def grab(state, epoch):
        if epoch == 1:  # after epoch index 1 (2 epochs done)
            # deep-copy: the live state's buffers are donated on the next
            # step (disk checkpointing copies to host the same way)
            halves["mid"] = jax.tree.map(lambda a: jnp.array(a), state)

    _ = t2.fit(key, (x, None), (xt, None), checkpoint_fn=grab)
    t3 = make()
    s_res, _ = t3.fit(key, (x, None), (xt, None), resume_state=halves["mid"])

    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        assert jnp.allclose(a, b, atol=1e-6), "resume diverged from straight run"


def test_eval_nll_x_two_lane():
    """x-lane NLL (the reference's x_jac metric) from per-lane logdets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hint_tpu.models import builders
    from hint_tpu.train.trainer import Trainer

    m = builders.conditional_hint(
        dim_x=8, dim_y=3, n_blocks=2, c_internal=(8,), hidden_external=8, hidden_y=8
    )
    tr = Trainer(model=m, kind="hint", batch_size=16, n_epochs=1)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    y = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    terms, nll_x = tr.eval_epoch(state.params, x, y, jax.random.PRNGKey(3), return_nll_x=True)
    assert terms.shape == (2,) and np.isfinite(nll_x)
    # x-lane NLL is bounded by the total two-lane NLL structure: finite, real
    # and unconditional models report NaN
    m2 = builders.inn(8, 1, 8)
    tr2 = Trainer(model=m2, kind="unconditional", batch_size=16, n_epochs=1)
    s2 = tr2.init_state(jax.random.PRNGKey(4))
    _, nx2 = tr2.eval_epoch(s2.params, x, None, jax.random.PRNGKey(5), return_nll_x=True)
    assert np.isnan(nx2)


def test_remat_step_matches_plain():
    """with_remat is math-identical: same init, same batch, same noise key
    -> same updated params and loss terms as the non-remat model."""
    from hint_tpu.models.flow import with_remat

    m = builders.hint(dim=12, n_blocks=2, c_internal=(16, 8))
    kwargs = dict(kind=UNCONDITIONAL, batch_size=32, max_batches_per_epoch=1,
                  l2_weight_reg=1.86e-5)
    tr_a = Trainer(model=m, **kwargs)
    tr_b = Trainer(model=with_remat(m), **kwargs)
    state_a = tr_a.init_state(jax.random.PRNGKey(0))
    state_b = tr_b.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 12))
    y = jnp.zeros((32, 0))
    key, lr = jax.random.PRNGKey(2), jnp.asarray(1e-3)
    new_a, terms_a = tr_a.step_fn(state_a, x, y, key, lr)
    new_b, terms_b = tr_b.step_fn(state_b, x, y, key, lr)
    np.testing.assert_allclose(np.asarray(terms_b), np.asarray(terms_a), atol=1e-6)
    for a, b in zip(jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_remat_scanned_matches_plain():
    from hint_tpu.models.flow import with_remat

    m = builders.hint(dim=8, n_blocks=3, c_internal=(16,), scan_blocks=True)
    params = m.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 8))

    def nll(model, p):
        z, ld = model.forward(p, x)
        return 0.5 * jnp.sum(z**2, axis=1).mean() - ld.mean()

    g_a = jax.grad(lambda p: nll(m, p))(params)
    g_b = jax.grad(lambda p: nll(with_remat(m), p))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_remat_off_by_default():
    """Round-3 default: make_trainer builds a non-remat model; remat=True
    opts in (on-chip A/B in artifacts/profile_steps.json)."""
    from hint_tpu.configs import get_config

    cfg = get_config("lens_shape.unconditional_inn_1")
    assert not cfg.make_trainer().model.remat
    assert cfg.make_trainer(remat=True).model.remat


def test_zero_batches_raises():
    """Dataset smaller than one drop-last batch must fail loudly, not
    scan zero steps and report NaN losses."""
    m = builders.inn(dim=6, n_blocks=1, hidden=8)
    tr = Trainer(model=m, kind=UNCONDITIONAL, batch_size=64, n_epochs=1)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = jnp.zeros((32, 6), jnp.float32)  # 32 rows < batch_size 64
    with pytest.raises(ValueError, match="zero drop-last batches"):
        tr.train_epoch(state, x, None, jax.random.PRNGKey(1), 0)


def test_eval_epoch_whole_set_fallback_below_batch_size():
    # regression: the zero-batch guard must not fire on the eval path —
    # a test set smaller than batch_size evaluates as one whole batch
    dim = 4
    m = builders.hint(dim=dim, n_blocks=1, c_internal=(8, 4))
    tr = Trainer(
        model=m, kind=UNCONDITIONAL, n_epochs=1, batch_size=64,
        lr_init=0.01, pre_low_lr=1, init_scale=0.005, l2_weight_reg=0.0,
    )
    x, _ = _toy_gaussian_data(jax.random.PRNGKey(0), 20, dim)  # 20 < 64
    state = tr.init_state(jax.random.PRNGKey(1))
    terms = tr.eval_epoch(state.params, jnp.asarray(x), None, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(terms)))
    # the training path still raises on a zero-batch epoch
    with pytest.raises(ValueError, match="zero drop-last batches"):
        tr.train_epoch(state, jnp.asarray(x), None, jax.random.PRNGKey(3), 0)
