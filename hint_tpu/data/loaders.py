"""Data pipelines: npy caching + device-resident arrays.

Replaces the reference's torch ``DataLoader`` factories
(/root/reference/data.py:466-508) with an HBM-resident design: the full
train/test arrays are uploaded to device once; per-epoch shuffling is a JAX
PRNG permutation gather on device, and batches are static slices — zero
host↔device traffic in the epoch loop (the reference pays one host→GPU copy
per batch, train_unconditional.py:120).

* ``prepare_toy_data`` — caches generated (x, y) to ``data/{name}_{x,y}_
  {train,test}.npy`` and regenerates when missing or short
  (data.py:466-489);
* ``prepare_uci_data`` — name-dispatch to Power/Gas/Miniboone; test set is a
  single full-size batch with dummy zero labels (data.py:493-508).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

Arrays = Tuple[np.ndarray, Optional[np.ndarray]]


def prepare_toy_data(
    model, n_train: int, n_test: int, cache_dir: str = "data", engine: str = "auto"
) -> Tuple[Arrays, Arrays]:
    """Returns ((x_train, y_train), (x_test, y_test)) float32 numpy arrays.

    engine: "auto" (native C++ generator when it builds, else numpy),
    "native", or "numpy". The native generator is 15-65x faster per sample
    (hint_tpu/native/); it matches the numpy pipeline's geometry exactly and
    its distribution statistically (its RNG stream differs).
    """
    os.makedirs(cache_dir, exist_ok=True)

    def generate(n: int, seed: int):
        if engine in ("auto", "native"):
            try:
                from hint_tpu.data import native

                return native.sample_joint(model.name, n, seed=seed)
            except Exception as e:
                if engine == "native":
                    raise
                print(f"native generator unavailable ({e!r}); numpy fallback "
                      f"(15-65x slower)")
        return model.sample_joint(n)

    def load_or_generate(split: str, n: int):
        fx = os.path.join(cache_dir, f"{model.name}_x_{split}.npy")
        fy = os.path.join(cache_dir, f"{model.name}_y_{split}.npy")
        try:
            x = np.load(fx)[:n, :]
            y = np.load(fy)[:n]
            if x.shape[0] < n:
                raise ValueError("cache too small")
        except Exception:
            print(
                f'Not enough {split} data for model "{model.name}" found, '
                f"generating {n} new samples..."
            )
            x, y = generate(n, seed=0 if split == "train" else 1)
            np.save(fx, x)
            np.save(fy, y)
        return x.astype(np.float32), y.astype(np.float32)

    return load_or_generate("train", n_train), load_or_generate("test", n_test)


def prepare_uci_data(dataset_name: str = "power", root: str = ".") -> Tuple[Arrays, Arrays]:
    """Returns ((x_train, zeros), (x_test, zeros)); test = one full batch
    (data.py:505-506)."""
    from hint_tpu.data.uci import Gas, Miniboone, Power

    if dataset_name == "power":
        data = Power(root)
    elif dataset_name == "gas":
        data = Gas(root)
    elif dataset_name == "miniboone":
        data = Miniboone(root)
    else:
        raise ValueError("Dataset not known.")
    x_tr = data.trn.astype(np.float32)
    x_te = data.tst.astype(np.float32)
    return (x_tr, np.zeros((len(x_tr), 1), np.float32)), (
        x_te,
        np.zeros((len(x_te), 1), np.float32),
    )


def to_device(arrays: Arrays, sharding=None):
    """Upload (x, y) once; optionally with a batch-axis sharding."""
    import jax

    x, y = arrays
    if sharding is not None:
        x = jax.device_put(x, sharding)
        y = jax.device_put(y, sharding) if y is not None else None
    else:
        x = jax.device_put(x)
        y = jax.device_put(y) if y is not None else None
    return x, y
