from hint_tpu.evaluation.mmd import multi_mmd
from hint_tpu.evaluation.sampling import sample_model
from hint_tpu.evaluation.metrics import uci_log_likelihood, per_dim_likelihood

__all__ = [
    "multi_mmd",
    "sample_model",
    "uci_log_likelihood",
    "per_dim_likelihood",
    # submodules (imported lazily by callers): abc, shape_fit
]
