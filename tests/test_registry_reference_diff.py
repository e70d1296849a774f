"""Exhaustive diff of configs/registry_data.py against the mounted reference.

Round 1 hand-flattened the reference's 73 side-effectful config modules
(~1,500 values) into the declarative registry and spot-verified 8 of them;
this test pins ALL of them. Each reference module's ``c = {...}`` literal and
its graph-construction ``Node(...)`` kwargs are extracted with ``ast`` and
evaluated by a whitelisting mini-interpreter (names/binops/subscripts only —
no reference code is executed), then compared field-by-field to the registry
entry of the same name. A transposed digit anywhere in registry_data.py now
fails a test instead of silently changing a benchmark.

Reference shapes handled (all of /root/reference/configs/**):
  * hyperparameter dict (e.g. plus_shape/unconditional_hint_4_full.py:16-46)
  * HouseholderPerm 'fixed' kwarg (…:62-64; False in *_Q / *_4_3 variants)
  * HAC 'c_internal' width chains incl. //2 //4 //8 derivations (…:68-70)
  * 'max_splits' via literal or c['recursion_depth'] (unconditional_hint_4_3.py:70,
    unconditional_hint_4_3_reshuffle.py:71)
  * 'reshuffle': True (unconditional_hint_4_3_reshuffle.py:72)
  * AffineCoupling / ExternalAffineCoupling F_args internal_size
    (conditional_hint_8_full.py:78-89 — external uses hidden, y-lane hidden//2)
"""

import ast
import os

import pytest

from hint_tpu.configs import get_config, list_configs

REF_CONFIGS = "/root/reference/configs"

# (n_parameters, n_observations) per data model — data.py:78-79,169-170,
# 291(power d=6), 355(gas d=8), 423(miniboone d=42), 22-23(fourier-curve,
# the dropped family still imported by 4 vestigial plus_shape modules)
_DATA_DIMS = {
    "lens-shape": (20, 2),
    "plus-shape": (100, 4),
    "fourier-curve": (4, 1),
    "power": (6, 0),
    "gas": (8, 0),
    "miniboone": (42, 0),
}

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.Subscript,
    ast.Name, ast.Tuple, ast.List, ast.Dict, ast.Load, ast.Call,
    ast.FloorDiv, ast.Div, ast.Mult, ast.Add, ast.Sub, ast.Pow, ast.USub,
)
_ALLOWED_CALLS = {"int", "sqrt"}  # unconditional_hint_4_3_lessshrink.py:71


def _safe_eval(node, env):
    """Evaluate a hyperparameter expression; only literal/arithmetic/lookup
    node types (plus int()/sqrt()) are allowed, so nothing from the reference
    executes as code."""
    for sub in ast.walk(node):
        if not isinstance(sub, _ALLOWED_NODES):
            raise ValueError(f"disallowed expression node {type(sub).__name__}")
        if isinstance(sub, ast.Call) and not (
            isinstance(sub.func, ast.Name) and sub.func.id in _ALLOWED_CALLS
        ):
            raise ValueError("disallowed call")
    return eval(  # noqa: S307 - whitelisted node types only
        compile(ast.Expression(body=node), "<config>", "eval"),
        {"__builtins__": {}},
        env,
    )


def _extract(path, n_parameters, n_observations):
    """Parse one reference config module into (cdict, graph_info)."""
    import math

    tree = ast.parse(open(path).read())
    env = {
        "n_parameters": n_parameters,
        "n_observations": n_observations,
        "F_fully_connected": "F_fully_connected",
        "int": int,
        "sqrt": math.sqrt,
    }
    cdict = None
    for stmt in tree.body:
        if (
            isinstance(stmt, ast.Assign)
            and len(stmt.targets) == 1
            and isinstance(stmt.targets[0], ast.Name)
            and stmt.targets[0].id == "c"
            and isinstance(stmt.value, ast.Dict)
        ):
            cdict = {}
            for k, v in zip(stmt.value.keys, stmt.value.values):
                key = ast.literal_eval(k)
                try:
                    cdict[key] = _safe_eval(v, env)
                except ValueError:
                    pass  # suffix f-string, data_model ctor, device etc.
            break
    assert cdict is not None, f"no c = {{...}} dict found in {path}"
    env["c"] = cdict

    info = {
        "perm_fixed": set(),
        "hac_kwargs": [],
        "coupling_sizes": [],  # (class_name, internal_size, conditioned)
        "hac_conditioned": set(),
    }
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "Node"
            and len(node.args) >= 3
            and isinstance(node.args[1], ast.Name)
        ):
            continue
        cls = node.args[1].id
        kwargs = _safe_eval(node.args[2], env)
        conditioned = any(kw.arg == "conditions" for kw in node.keywords)
        if cls == "HouseholderPerm":
            info["perm_fixed"].add(kwargs["fixed"])
        elif cls == "HierarchicalAffineCouplingBlock":
            info["hac_kwargs"].append(kwargs)
            info["hac_conditioned"].add(conditioned)
        elif cls in ("AffineCoupling", "ExternalAffineCoupling"):
            info["coupling_sizes"].append(
                (cls, kwargs["F_args"]["internal_size"], conditioned)
            )
    return cdict, info


def _all_pairs():
    """(registry_name, reference_path) for every config, vestigial included
    (the 4 vestigial modules live in plus_shape/ but import the abstract
    FourierCurveModel — unrunnable, yet their hyperparameters are still
    transcribed and diffable)."""
    pairs = []
    for name in list_configs():
        family, module = name.split(".", 1)
        pairs.append((name, os.path.join(REF_CONFIGS, family, module + ".py")))
    return pairs


def test_every_reference_config_has_a_registry_entry():
    ref_modules = {
        f"{fam}.{f[:-3]}"
        for fam in os.listdir(REF_CONFIGS)
        if os.path.isdir(os.path.join(REF_CONFIGS, fam))
        for f in os.listdir(os.path.join(REF_CONFIGS, fam))
        if f.endswith(".py")
    }
    assert ref_modules == set(list_configs())
    # vestigial flag must be exactly the modules importing the abstract
    # FourierCurveModel (SURVEY.md §2 dead-code note)
    for name in list_configs():
        fam, mod = name.split(".", 1)
        src = open(os.path.join(REF_CONFIGS, fam, mod + ".py")).read()
        is_fourier = "from data import FourierCurveModel" in src
        assert get_config(name).vestigial == is_fourier, name


@pytest.mark.parametrize("name,path", _all_pairs(), ids=lambda p: p if isinstance(p, str) and "." in p else "")
def test_registry_matches_reference(name, path):
    cfg = get_config(name)
    nx, ny = _DATA_DIMS[cfg.data]
    cdict, info = _extract(path, nx, ny)

    # dimensions
    assert cdict["ndim_x"] == cfg.ndim_x
    if cfg.is_conditional:
        assert cdict["ndim_y"] == cfg.ndim_y
    assert cdict["ndim_z"] == cfg.ndim_z

    # hyperparameter dict fields
    assert cdict["n_blocks"] == cfg.n_blocks
    assert cdict["hidden_layer_sizes"] == cfg.hidden
    assert cdict["init_scale"] == cfg.init_scale
    assert cdict["n_epochs"] == cfg.n_epochs
    assert cdict["max_batches_per_epoch"] == cfg.max_batches_per_epoch
    assert cdict["batch_size"] == cfg.batch_size
    assert cdict.get("n_train") == cfg.n_train
    assert cdict.get("n_test") == cfg.n_test
    assert cdict["lr_init"] == cfg.lr_init
    assert cdict["pre_low_lr"] == cfg.pre_low_lr
    assert cdict["final_decay"] == cfg.final_decay
    assert cdict["l2_weight_reg"] == cfg.l2_weight_reg
    assert tuple(cdict["adam_betas"]) == tuple(cfg.adam_betas)
    vis = cdict.get("vis_y_target")
    assert (tuple(vis) if vis is not None else None) == cfg.vis_y_target

    # graph-construction constants
    if info["perm_fixed"]:
        assert info["perm_fixed"] == {cfg.perm_fixed}, "HouseholderPerm fixed flag"

    if cfg.model_type in ("hint", "recursive_cinn", "conditional_hint"):
        assert info["hac_kwargs"], f"{name}: expected a HAC node in the reference"
        hac = info["hac_kwargs"][0]
        assert all(k == hac for k in info["hac_kwargs"])  # one block pattern
        assert tuple(hac["c_internal"]) == cfg.c_internal
        assert hac.get("max_splits", -1) == cfg.max_splits
        assert hac.get("reshuffle", False) == cfg.reshuffle
        # recursive_cinn feeds the condition into the HAC; plain hint doesn't
        assert info["hac_conditioned"] == {cfg.model_type == "recursive_cinn"}
    else:
        assert not info["hac_kwargs"]
        assert cfg.c_internal is None

    if cfg.model_type in ("inn", "cinn"):
        couplings = info["coupling_sizes"]
        assert couplings and all(c[0] == "AffineCoupling" for c in couplings)
        assert {c[1] for c in couplings} == {cfg.hidden}
        assert {c[2] for c in couplings} == {cfg.model_type == "cinn"}

    if cfg.model_type == "conditional_hint":
        # external y->x coupling at width hidden; y-lane coupling at the
        # per-config hidden_y (conditional_hint_*_full.py:78-89 — lens //4,
        # plus //2, vestigial fourier full width)
        ext = [c for c in info["coupling_sizes"] if c[0] == "ExternalAffineCoupling"]
        ylane = [c for c in info["coupling_sizes"] if c[0] == "AffineCoupling"]
        assert {c[1] for c in ext} == {cfg.hidden}
        assert cfg.hidden_y is not None
        assert {c[1] for c in ylane} == {cfg.hidden_y}
