"""Declarative config registry.

Replaces the reference's 73 side-effectful config modules (each builds data
loaders and a CUDA model *at import time* and is selected by comment-toggling
or ``exec`` of module paths — /root/reference/configs/*,
run_experiments.py:102; SURVEY.md §5 "Config / flag system"). Here a config
is a frozen dataclass; nothing happens until ``build_model()`` /
``load_data()`` are called, and selection is a plain string lookup.

Names match the reference modules 1:1, e.g.
``plus_shape.unconditional_hint_4_full``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from hint_tpu.configs.registry_data import CONFIGS
from hint_tpu.models import builders

# dataset dimensionalities (reference: data.py:78-79,169-170,291,355,423;
# fourier-curve is the dropped third family, FourierCurveModel at data.py:22-23)
_DATA_DIMS = {
    "plus-shape": (100, 4),
    "lens-shape": (20, 2),
    "fourier-curve": (4, 1),
    "power": (6, 0),
    "gas": (8, 0),
    "miniboone": (42, 0),
}

_SUFFIX_NAME = {  # reference `model.name` values used in suffix strings
    "plus-shape": "plus-shape",
    "lens-shape": "lens-shape1",  # data.py:83 quirk
    "fourier-curve": "fourier-curve",
    "power": "power",
    "gas": "gas",
    "miniboone": "miniboone",
}


@dataclasses.dataclass(frozen=True)
class Config:
    name: str
    data: str
    model_type: str  # inn | hint | cinn | recursive_cinn | conditional_hint
    n_blocks: int
    hidden: int
    c_internal: Optional[Tuple[int, ...]]
    max_splits: int
    perm_fixed: bool
    reshuffle: bool
    init_scale: float
    n_epochs: int
    max_batches_per_epoch: int
    batch_size: int
    n_train: Optional[int]
    n_test: Optional[int]
    lr_init: float
    pre_low_lr: int
    final_decay: float
    l2_weight_reg: float
    adam_betas: Tuple[float, float]
    vis_y_target: Optional[Tuple[float, ...]]
    vestigial: bool = False
    # y-lane AffineCoupling width for conditional_hint graphs; the reference
    # derives it per-family (lens: hidden//4, plus: hidden//2, vestigial
    # fourier: hidden — configs/*/conditional_hint_*_full.py:88)
    hidden_y: Optional[int] = None

    @property
    def ndim_x(self) -> int:
        return _DATA_DIMS[self.data][0]

    @property
    def ndim_y(self) -> int:
        return _DATA_DIMS[self.data][1] if self.is_conditional else 0

    @property
    def ndim_z(self) -> int:
        if self.model_type == "conditional_hint":
            return self.ndim_x + self.ndim_y  # two-lane latent
        return self.ndim_x

    @property
    def is_conditional(self) -> bool:
        return self.model_type in ("cinn", "recursive_cinn", "conditional_hint")

    @property
    def is_uci(self) -> bool:
        return self.data in ("power", "gas", "miniboone")

    @property
    def kind(self) -> str:
        """Trainer kind (hint_tpu.train.trainer)."""
        if self.model_type == "conditional_hint":
            return "hint"
        if self.is_conditional:
            return "cinn"
        return "unconditional"

    @property
    def suffix(self) -> str:
        """Run identifier, mirroring the reference suffix scheme
        (e.g. configs/plus_shape/unconditional_hint_4_full.py:18)."""
        base = _SUFFIX_NAME[self.data]
        tail = self.name.split(".", 1)[1]
        if self.is_uci and tail.startswith(self.data + "_"):
            # uci modules embed the dataset name (configs/uci_data/power_hint_8.py:17)
            tail = tail[len(self.data) + 1 :]
        return f"{base}_{tail.replace('_', '-')}"

    def resolve_scan_blocks(self, scan_blocks: Optional[bool] = None) -> bool:
        """Resolve the ``scan_blocks`` tri-state: None (auto) enables
        ``lax.scan`` over repeated blocks for deep single-lane chains
        (n_blocks >= 16) — compile time becomes O(1) in depth (measured
        14.6 s -> 6.5 s on the 32-block grid configs) while training is
        bit-identical to the unrolled build (init happens in the unrolled
        view; checkpoints are layout-canonical — see models/flow.py)."""
        if scan_blocks is None:
            return self.model_type in ("inn", "hint") and self.n_blocks >= 16
        return bool(scan_blocks) and self.model_type in ("inn", "hint")

    def build_model(
        self,
        compute_dtype: str = "float32",
        impl: str = "levelwise",
        scan_blocks: Optional[bool] = None,
    ):
        d, dy = self.ndim_x, _DATA_DIMS[self.data][1]
        scan = self.resolve_scan_blocks(scan_blocks)
        if self.model_type == "inn":
            return builders.inn(
                d, self.n_blocks, self.hidden, self.perm_fixed, compute_dtype=compute_dtype,
                scan_blocks=scan,
            )
        if self.model_type == "hint":
            return builders.hint(
                d, self.n_blocks, self.c_internal, self.perm_fixed, self.max_splits,
                reshuffle=self.reshuffle, compute_dtype=compute_dtype, impl=impl,
                scan_blocks=scan,
            )
        if self.model_type == "cinn":
            return builders.cinn(
                d, dy, self.n_blocks, self.hidden, self.perm_fixed, compute_dtype=compute_dtype
            )
        if self.model_type == "recursive_cinn":
            return builders.recursive_cinn(
                d, dy, self.n_blocks, self.c_internal, self.perm_fixed, self.max_splits,
                compute_dtype=compute_dtype, impl=impl,
            )
        if self.model_type == "conditional_hint":
            # external coupling uses hidden; y-lane coupling width is the
            # per-config hidden_y (conditional_hint_*_full.py:78-89)
            return builders.conditional_hint(
                d, dy, self.n_blocks, self.c_internal, hidden_external=self.hidden,
                hidden_y=self.hidden_y if self.hidden_y is not None else self.hidden // 2,
                perm_fixed=self.perm_fixed,
                max_splits=self.max_splits, compute_dtype=compute_dtype, impl=impl,
            )
        raise ValueError(f"unknown model_type {self.model_type!r}")

    def make_trainer(
        self,
        mesh=None,
        compute_dtype: str = "float32",
        impl: str = "levelwise",
        lr_semantics: str = "legacy",
        # remat default flipped OFF in round 3: slope-timed on-chip A/B
        # (artifacts/profile_steps.json) measured remat 17% slower at f32
        # and 11% slower at bf16 — the round-2 "HBM-bound" justification
        # rested on tunnel-polluted wall numbers (docs/perf.md)
        remat: bool = False,
        scan_blocks: Optional[bool] = None,
    ):
        from hint_tpu.train.trainer import Trainer

        model = self.build_model(
            compute_dtype=compute_dtype, impl=impl, scan_blocks=scan_blocks
        )
        if remat:
            from hint_tpu.models.flow import with_remat

            model = with_remat(model)
        return Trainer(
            lr_semantics=lr_semantics,
            model=model,
            kind=self.kind,
            lr_init=self.lr_init,
            pre_low_lr=self.pre_low_lr,
            final_decay=self.final_decay,
            n_epochs=self.n_epochs,
            adam_betas=self.adam_betas,
            l2_weight_reg=self.l2_weight_reg,
            init_scale=self.init_scale,
            batch_size=self.batch_size,
            max_batches_per_epoch=self.max_batches_per_epoch,
            mesh=mesh,
        )

    def load_data(self, cache_dir: str = "data", uci_root: str = "."):
        """Returns ((x_train, y_train), (x_test, y_test)) numpy arrays."""
        if self.vestigial:
            raise RuntimeError(
                f"{self.name} references the dropped 'fourier-curve' family and is "
                "not runnable in the reference either (abstract FourierCurveModel; "
                "SURVEY.md §2 dead-code note)."
            )
        if self.is_uci:
            from hint_tpu.data.loaders import prepare_uci_data

            return prepare_uci_data(self.data, uci_root)
        from hint_tpu.data.fourier import LensShapeModel, PlusShapeModel
        from hint_tpu.data.loaders import prepare_toy_data

        model = PlusShapeModel() if self.data == "plus-shape" else LensShapeModel()
        return prepare_toy_data(model, self.n_train, self.n_test, cache_dir)

    def data_model(self):
        from hint_tpu.data.fourier import LensShapeModel, PlusShapeModel

        if self.data == "plus-shape":
            return PlusShapeModel()
        if self.data == "lens-shape":
            return LensShapeModel()
        raise ValueError(f"no generative data model for {self.data!r}")


def get_config(name: str) -> Config:
    if name not in CONFIGS:
        raise KeyError(
            f"unknown config {name!r}; see hint_tpu.configs.list_configs()"
        )
    return Config(name=name, **CONFIGS[name])


def list_configs(prefix: str = "") -> Tuple[str, ...]:
    return tuple(sorted(k for k in CONFIGS if k.startswith(prefix)))
