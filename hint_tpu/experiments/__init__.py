from hint_tpu.experiments.drivers import (
    collect_shape_results,
    eval_shapes,
    test_likelihood,
    train_and_evaluate,
    uci_collect_results,
    uci_train_and_eval,
)

__all__ = [
    "train_and_evaluate",
    "collect_shape_results",
    "test_likelihood",
    "uci_train_and_eval",
    "uci_collect_results",
    "eval_shapes",
]
