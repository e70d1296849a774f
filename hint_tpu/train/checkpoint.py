"""Checkpointing: params + optimizer state + epoch.

The reference saves only the model state dict, terminally, with optimizer
save/restore commented out (/root/reference/train_unconditional.py:38-49);
mid-training resume does not exist there (SURVEY.md §5). Here checkpoints are
full-fidelity pytrees (params, Adam moments, epoch) so training resumes
exactly, in two interchangeable formats:

* ``.npz``: dependency-free flat key-path archive (default; portable);
* orbax: for large-scale / async checkpointing, if available.

Layout canonicalization: scanned models (``ScannedRepeat``, models/flow.py)
hold params stacked along a repeat axis, which would make their flat key
paths incompatible with the equivalent unrolled build. Pass ``model=`` to
``save_npz``/``load_npz`` and the file is always written in the UNROLLED
layout — so a checkpoint written by either build of a config loads into
either build, and all pre-existing (unrolled) checkpoints keep working.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from hint_tpu.train.trainer import TrainState
from hint_tpu.train.optim import AdamState

_SEP = "/"


def _flatten(tree: Any, prefix: str = ""):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "".join(jax.tree_util.keystr((p,)) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unroll_state(state: TrainState, model) -> TrainState:
    """Rewrite every param-shaped tree of ``state`` into the unrolled layout
    (identity when ``model`` is None or nothing in it is scanned)."""
    if model is None:
        return state
    from hint_tpu.models.flow import to_unrolled_tree

    params = to_unrolled_tree(model, state.params)
    if params is state.params:
        return state
    opt = AdamState(
        step=state.opt.step,
        mu=to_unrolled_tree(model, state.opt.mu),
        nu=to_unrolled_tree(model, state.opt.nu),
    )
    return TrainState(params=params, opt=opt, epoch=state.epoch)


def save_npz(path: str, state: TrainState, model=None) -> None:
    state = _unroll_state(state, model)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    arrays.update(_flatten(state.params, "params"))
    arrays.update(_flatten(state.opt.mu, "mu"))
    arrays.update(_flatten(state.opt.nu, "nu"))
    arrays["opt_step"] = np.asarray(state.opt.step)
    arrays["epoch"] = np.asarray(state.epoch)
    np.savez(path, **arrays)


def _unflatten_into(template: Any, arrays, prefix: str):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + "".join(jax.tree_util.keystr((p,)) for p in path)
        arr = arrays[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"checkpoint leaf {key}: shape {arr.shape} != model {leaf.shape}")
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_npz(path: str, template: TrainState, model=None) -> TrainState:
    """Load into the structure of ``template`` (shapes are validated).
    ``model``: required for scanned models — the on-disk layout is unrolled
    and gets restacked into the template's scanned layout."""
    utemplate = _unroll_state(template, model)
    with np.load(path) as arrays:
        params = _unflatten_into(utemplate.params, arrays, "params")
        mu = _unflatten_into(utemplate.opt.mu, arrays, "mu")
        nu = _unflatten_into(utemplate.opt.nu, arrays, "nu")
        if utemplate is not template:
            from hint_tpu.models.flow import to_stacked_tree

            params = to_stacked_tree(model, params)
            mu = to_stacked_tree(model, mu)
            nu = to_stacked_tree(model, nu)
        opt = AdamState(
            step=jax.numpy.asarray(arrays["opt_step"]), mu=mu, nu=nu
        )
        return TrainState(params=params, opt=opt, epoch=jax.numpy.asarray(arrays["epoch"]))


def save_params_npz(path: str, params: Any, model=None) -> None:
    """Weights-only save (the reference's ``save()`` analogue,
    train_unconditional.py:38-40)."""
    if model is not None:
        from hint_tpu.models.flow import to_unrolled_tree

        params = to_unrolled_tree(model, params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(params, "params"))


def load_params_npz(path: str, template: Any, model=None) -> Any:
    if model is not None:
        from hint_tpu.models.flow import to_unrolled_tree, to_stacked_tree

        utemplate = to_unrolled_tree(model, template)
        with np.load(path) as arrays:
            return to_stacked_tree(model, _unflatten_into(utemplate, arrays, "params"))
    with np.load(path) as arrays:
        return _unflatten_into(template, arrays, "params")


# -- orbax (optional) ----------------------------------------------------------


def save_orbax(directory: str, state: TrainState, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"step_{int(step or state.epoch)}")
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_orbax(directory: str, step: int, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"step_{int(step)}")
    return ckptr.restore(path, template)
