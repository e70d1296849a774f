"""Max-likelihood training loops.

Functional re-design of the reference trainers
(/root/reference/train_unconditional.py:98-210,
/root/reference/train_conditional.py:102-224):

* one jit-compiled train step (forward + NLL + grad + masked torch-parity
  Adam) with the learning rate as a traced argument — the whole LR schedule
  reuses a single compilation;
* per-batch Gaussian input noise σ=0.01 on x (never y), applied at train
  *and* eval time for parity (train_unconditional.py:121, :81);
* loss = mean(½‖z‖²) − mean(log|det J|) (train_unconditional.py:128-129);
* model "kind" is an explicit enum — replacing the reference's
  ``'hint' in c.suffix`` string dispatch (train_conditional.py:129-137);
* conditional two-lane loss concatenates (z_x, z_y) with the full log-det
  (train_conditional.py:130-132); the x-lane-only NLL is read from the
  per-lane log-det instead of the node-name hack (train_conditional.py:50-55);
* epochs iterate device-resident data with a JAX-PRNG shuffle, drop-last
  batching and the ``max_batches_per_epoch`` cap
  (train_unconditional.py:114-118, data.py:484-487);
* data parallelism: pass ``mesh`` to shard the batch over devices; params
  stay replicated and XLA inserts the gradient all-reduce over ICI
  (SURVEY.md §2.4 — the one meaningful distribution axis at these sizes).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.models.flow import Flow, TwoLaneFlow
from hint_tpu.train.optim import (
    AdamState,
    apply_updates,
    init_trainables,
    lr_schedule,
    make_optimizer,
)

NOISE_STD = 0.01  # train_unconditional.py:121

# model kinds (explicit, replacing suffix-substring dispatch)
UNCONDITIONAL = "unconditional"  # Flow, no condition
CONDITIONAL_CINN = "cinn"  # Flow with cond_dim > 0, z = f(x; y)
CONDITIONAL_HINT = "hint"  # TwoLaneFlow, (z_y, z_x) = f(y, x)


class TrainState(NamedTuple):
    params: Any
    opt: AdamState
    epoch: jax.Array


def _host_cpu_device():
    """The host CPU device, force-registering the CPU platform if the
    session pinned ``jax_platforms`` to an accelerator plugin only (the axon
    tunnel does). Eager init through a tunnel costs minutes of per-op RTT;
    falling back to the accelerator device is the last resort."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        try:
            current = jax.config.jax_platforms or jax.default_backend()
            if "cpu" not in current.split(","):
                jax.config.update("jax_platforms", current + ",cpu")
            return jax.devices("cpu")[0]
        except Exception:
            return jax.devices()[0]


def nll_terms(z: jax.Array, logdet: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """The two loss terms ['-log p(z)', '-log |det(J)|']."""
    return 0.5 * jnp.sum(z**2, axis=1).mean(), -logdet.mean()


@dataclasses.dataclass
class Trainer:
    model: Any  # Flow | TwoLaneFlow
    kind: str
    lr_init: float = 0.01
    pre_low_lr: int = 3
    final_decay: float = 0.01
    n_epochs: int = 50
    adam_betas: Tuple[float, float] = (0.9, 0.95)
    l2_weight_reg: float = 0.0
    init_scale: float = 0.005
    batch_size: int = 1000
    max_batches_per_epoch: int = 100
    mesh: Optional[jax.sharding.Mesh] = None
    data_axis: str = "data"
    # which torch StepLR behavior to reproduce post-warmup (see optim.py
    # docstring; "legacy" = torch-1.x closed form, "modern" = torch>=1.4
    # chainable semantics the reference executes today)
    lr_semantics: str = "legacy"
    # per-batch Gaussian input-noise std on x (train_unconditional.py:121);
    # a field (not a constant) so parity tests can inject exact noise
    noise_std: float = NOISE_STD

    def __post_init__(self):
        if self.kind == CONDITIONAL_HINT and not isinstance(self.model, TwoLaneFlow):
            raise TypeError("kind='hint' requires a TwoLaneFlow model")
        if self.kind != CONDITIONAL_HINT and not isinstance(self.model, Flow):
            raise TypeError(f"kind={self.kind!r} requires a Flow model")
        self._step_fn = None
        self._eval_fn = None

    # -- state ----------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        # Initialize on host CPU, eagerly: init is a one-shot pass of
        # thousands of tiny ops — compiling it (minutes of XLA time) or
        # dispatching it op-by-op to the TPU both waste time; eager CPU takes
        # seconds and the params transfer once.
        cpu = _host_cpu_device()
        with jax.default_device(cpu):
            k_init, k_scale = jax.random.split(key)
            # Initialize in the UNROLLED view and restack: a scanned build
            # (ScannedRepeat) then starts from bit-identical weights as the
            # unrolled build of the same config — key splits and the
            # init_trainables leaf order are those of the unrolled chain.
            # For unscanned models both calls are identities.
            from hint_tpu.models.flow import to_stacked_tree, unrolled_view

            umodel = unrolled_view(self.model)
            params = umodel.init(k_init)
            umask = umodel.trainable_mask(params)
            if self.init_scale > 0:
                params = init_trainables(params, umask, k_scale, self.init_scale)
            params = to_stacked_tree(self.model, params)
            mask = self.model.trainable_mask(params)
        if jax.default_backend() != "cpu":
            params = jax.device_put(params, jax.devices()[0])
        opt_init, _ = make_optimizer(self.adam_betas, self.l2_weight_reg, mask)
        return TrainState(params=params, opt=opt_init(params), epoch=jnp.zeros([], jnp.int32))

    def n_trainable_params(self, state: TrainState) -> int:
        mask = self.model.trainable_mask(state.params)
        return sum(
            int(np.prod(p.shape))
            for p, m in zip(jax.tree.leaves(state.params), jax.tree.leaves(mask))
            if m
        )

    # -- loss -----------------------------------------------------------------

    def _loss(self, params, x, y, train_time: bool):
        """Returns (total, (term1, term2, nll_x or nan))."""
        if self.kind == UNCONDITIONAL:
            z, logdet = self.model.forward(params, x)
            t1, t2 = nll_terms(z, logdet)
            return t1 + t2, (t1, t2, jnp.nan)
        if self.kind == CONDITIONAL_CINN:
            z, logdet = self.model.forward(params, x, y)
            t1, t2 = nll_terms(z, logdet)
            return t1 + t2, (t1, t2, jnp.nan)
        # two-lane conditional HINT: loss on concat(z_x, z_y) with full logdet
        z_y, z_x, ld_y, ld_x = self.model.forward(params, y, x)
        z = jnp.concatenate([z_x, z_y], axis=-1)
        t1, t2 = nll_terms(z, ld_y + ld_x)
        # x-lane-only NLL from the per-lane logdet (train_conditional.py:134)
        nll_x = 0.5 * jnp.sum(z_x**2, axis=1).mean() - ld_x.mean()
        return t1 + t2, (t1, t2, nll_x)

    # -- compiled steps ---------------------------------------------------------

    def _build(self):
        mask = None

        def get_mask(params):
            return self.model.trainable_mask(params)

        _, opt_update = make_optimizer(self.adam_betas, self.l2_weight_reg, mask)

        def train_step(state: TrainState, x, y, noise_key, lr):
            x = x + self.noise_std * jax.random.normal(noise_key, x.shape, x.dtype)

            def loss_fn(params):
                total, terms = self._loss(params, x, y, True)
                return total, terms

            (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            m = get_mask(state.params)
            _, upd_fn = make_optimizer(self.adam_betas, self.l2_weight_reg, m)
            updates, opt = upd_fn(grads, state.opt, state.params, lr)
            params = apply_updates(state.params, updates)
            return TrainState(params, opt, state.epoch), jnp.stack(terms[:2])

        def eval_step(params, x, y, noise_key):
            x = x + self.noise_std * jax.random.normal(noise_key, x.shape, x.dtype)
            _, terms = self._loss(params, x, y, False)
            return jnp.stack(terms[:2]), terms[2]

        def epoch_steps(state: TrainState, xb, yb, noise_keys, lr):
            """A whole epoch of train steps as ONE program (lax.scan over the
            batch axis). Math-identical to the per-batch loop — same slices,
            same keys, same op order — but a single dispatch, which matters
            when per-dispatch overhead rivals the step itself (axon tunnel:
            ~5-15 ms/call)."""

            def body(st, inp):
                x1, y1, k1 = inp
                st, terms = train_step(st, x1, y1, k1, lr)
                return st, terms

            return jax.lax.scan(body, state, (xb, yb, noise_keys))

        donate = (0,)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            batch = NamedSharding(self.mesh, P(self.data_axis))
            sbatch = NamedSharding(self.mesh, P(None, self.data_axis))
            self._step_fn = jax.jit(
                train_step,
                donate_argnums=donate,
                in_shardings=(repl, batch, batch, repl, repl),
                out_shardings=(repl, repl),
            )
            self._eval_fn = jax.jit(
                eval_step, in_shardings=(repl, batch, batch, repl), out_shardings=(repl, repl)
            )
            self._epoch_fn = jax.jit(
                epoch_steps,
                donate_argnums=donate,
                in_shardings=(repl, sbatch, sbatch, repl, repl),
                out_shardings=(repl, repl),
            )
        else:
            self._step_fn = jax.jit(train_step, donate_argnums=donate)
            self._eval_fn = jax.jit(eval_step)
            self._epoch_fn = jax.jit(epoch_steps, donate_argnums=donate)

    @property
    def step_fn(self) -> Callable:
        if self._step_fn is None:
            self._build()
        return self._step_fn

    @property
    def eval_fn(self) -> Callable:
        if self._eval_fn is None:
            self._build()
        return self._eval_fn

    @property
    def epoch_fn(self) -> Callable:
        if getattr(self, "_epoch_fn", None) is None:
            self._build()
        return self._epoch_fn

    # -- epoch loops -----------------------------------------------------------

    def _batches(self, key, n: int, train: bool):
        """Shuffled drop-last batch index blocks (host-side permutation)."""
        perm = jax.random.permutation(key, n)
        n_batches = n // self.batch_size
        if n_batches == 0 and train:
            # eval_epoch handles n_batches == 0 itself (whole-set fallback);
            # only a zero-batch *training* epoch is a silent no-op worth raising on
            raise ValueError(
                f"dataset of {n} rows yields zero drop-last batches at "
                f"batch_size={self.batch_size}; shrink the batch or grow the data"
            )
        if self.max_batches_per_epoch > 0:
            n_batches = min(n_batches, self.max_batches_per_epoch)
        return perm, n_batches

    def train_epoch(self, state: TrainState, x, y, key, epoch: int, monitor=None) -> Tuple[TrainState, np.ndarray]:
        lr = lr_schedule(
            epoch, self.lr_init, self.pre_low_lr, self.final_decay, self.n_epochs,
            self.lr_semantics,
        )
        k_perm, k_noise = jax.random.split(key)
        perm, n_batches = self._batches(k_perm, x.shape[0], True)
        x_sh, y_sh = x[perm], (y[perm] if y is not None else None)
        noise_keys = jax.random.split(k_noise, n_batches)
        if monitor is None:
            # whole epoch as one scanned program (identical math to the
            # per-batch loop below; one dispatch instead of n_batches)
            m = n_batches * self.batch_size
            xb = x_sh[:m].reshape(n_batches, self.batch_size, -1)
            yb = (
                y_sh[:m].reshape(n_batches, self.batch_size, -1)
                if y_sh is not None
                else jnp.zeros((n_batches, self.batch_size, 0), x.dtype)
            )
            state, terms = self.epoch_fn(state, xb, yb, noise_keys, lr)
            return state, np.mean(jax.device_get(terms), axis=0)
        losses = []
        for b in range(n_batches):
            xb = jax.lax.dynamic_slice_in_dim(x_sh, b * self.batch_size, self.batch_size)
            yb = (
                jax.lax.dynamic_slice_in_dim(y_sh, b * self.batch_size, self.batch_size)
                if y_sh is not None
                else jnp.zeros((self.batch_size, 0), x.dtype)
            )
            state, terms = self.step_fn(state, xb, yb, noise_keys[b], lr)
            losses.append(terms)
            monitor.update_progress(b + 1, epoch + 1)
        return state, np.mean(jax.device_get(jnp.stack(losses)), axis=0)

    def eval_epoch(
        self, params, x, y, key, full_batch: bool = False, return_nll_x: bool = False
    ):
        """Test pass. ``full_batch=True`` evaluates the whole set as one batch
        (UCI test semantics, data.py:505-506). ``return_nll_x=True``
        additionally returns the x-lane-only NLL for two-lane models — the
        reference's ``x_jac`` metric (train_conditional.py:50-55,134),
        principled via per-lane log-dets; NaN for single-lane models."""
        k_perm, k_noise = jax.random.split(key)

        def whole_set():
            yb = y if y is not None else jnp.zeros((x.shape[0], 0), x.dtype)
            terms, nll_x = self.eval_fn(params, x, yb, k_noise)
            return np.asarray(jax.device_get(terms)), float(nll_x)

        perm, n_batches = self._batches(k_perm, x.shape[0], False)
        if full_batch or n_batches == 0:
            terms, nll_x = whole_set()
            return (terms, nll_x) if return_nll_x else terms
        x_sh, y_sh = x[perm], (y[perm] if y is not None else None)
        losses, nll_xs = [], []
        noise_keys = jax.random.split(k_noise, n_batches)
        for b in range(n_batches):
            xb = jax.lax.dynamic_slice_in_dim(x_sh, b * self.batch_size, self.batch_size)
            yb = (
                jax.lax.dynamic_slice_in_dim(y_sh, b * self.batch_size, self.batch_size)
                if y_sh is not None
                else jnp.zeros((self.batch_size, 0), x.dtype)
            )
            terms, nll_x = self.eval_fn(params, xb, yb, noise_keys[b])
            losses.append(terms)
            nll_xs.append(nll_x)
        mean_terms = np.mean(jax.device_get(jnp.stack(losses)), axis=0)
        if return_nll_x:
            return mean_terms, float(np.mean(jax.device_get(jnp.stack(nll_xs))))
        return mean_terms

    def fit(
        self,
        key: jax.Array,
        train_data: Tuple,
        test_data: Tuple,
        monitor=None,
        full_batch_test: bool = False,
        checkpoint_fn=None,
        resume_state: Optional[TrainState] = None,
    ) -> Tuple[TrainState, float]:
        """Full training run; returns (state, final summed test loss) — the
        reference's ``main(c)`` contract (train_unconditional.py:161-210).

        ``resume_state``: continue exactly from a loaded checkpoint (params +
        Adam moments + epoch) — capability the reference lacks (its
        checkpointing is terminal, SURVEY.md §5).
        """
        x_tr, y_tr = train_data
        x_te, y_te = test_data
        k_state, key = jax.random.split(key)
        if resume_state is not None:
            state = resume_state
            start_epoch = int(state.epoch)
            # replay the key stream so epoch e uses the same keys as a
            # non-resumed run
            for _ in range(start_epoch):
                key, _, _ = jax.random.split(key, 3)
        else:
            state = self.init_state(k_state)
            start_epoch = 0
        t_start = time.time()
        test_losses = np.zeros(2)
        if start_epoch >= self.n_epochs:  # resumed a finished run: just eval
            key, k_te = jax.random.split(key)
            test_losses = self.eval_epoch(state.params, x_te, y_te, k_te, full_batch_test)
        for epoch in range(start_epoch, self.n_epochs):
            key, k_tr, k_te = jax.random.split(key, 3)
            state, train_losses = self.train_epoch(state, x_tr, y_tr, k_tr, epoch, monitor)
            test_losses = self.eval_epoch(state.params, x_te, y_te, k_te, full_batch_test)
            state = state._replace(epoch=state.epoch + 1)
            if monitor is not None and getattr(monitor, "wants_plots", False):
                self._push_plots(state.params, x_te, y_te, key, monitor)
            if monitor is not None:
                lr = float(
                    lr_schedule(
                        epoch, self.lr_init, self.pre_low_lr, self.final_decay,
                        self.n_epochs, self.lr_semantics,
                    )
                )
                monitor.update_losses(np.concatenate([train_losses, test_losses]), lr)
            if checkpoint_fn is not None:
                checkpoint_fn(state, epoch)
        minutes = (time.time() - t_start) / 60.0
        if monitor is not None:
            monitor.finish(minutes)
        return state, float(test_losses.sum())

    def _push_plots(self, params, x_te, y_te, key, monitor, n_vis: int = 512):
        """Per-epoch latent scatter + inverse-sample plot (the reference's
        test-pass visualization, train_unconditional.py:147-154)."""
        try:
            k_z, k_s = jax.random.split(key)
            xb = x_te[:n_vis]
            if self.kind == UNCONDITIONAL:
                z, _ = self.model.forward(params, xb)
                x_samp, _ = self.model.inverse(
                    params, jax.random.normal(k_z, (64, self.model.dim), xb.dtype)
                )
            elif self.kind == CONDITIONAL_CINN:
                yb = y_te[:n_vis]
                z, _ = self.model.forward(params, xb, yb)
                x_samp, _ = self.model.inverse(
                    params, jax.random.normal(k_z, (64, self.model.dim), xb.dtype), yb[:64]
                )
            else:
                yb = y_te[:n_vis]
                _, z, _, _ = self.model.forward(params, yb, xb)
                from hint_tpu.evaluation.sampling import sample_conditional_hint

                x_samp = sample_conditional_hint(self.model, params, yb[:64], k_z, k_s)
            monitor.update_plots(np.asarray(z[:, :2]), np.asarray(x_samp))
        except Exception:  # visualization must never kill training
            pass
