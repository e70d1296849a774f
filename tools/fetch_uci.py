#!/usr/bin/env python
"""Fetch the three UCI density-estimation datasets the reference benchmarks on.

The reference's loaders (/root/reference/data.py:283-462, adapted from
LukasRinder/normalizing-flows) expect the Papamakarios MAF benchmark data
layout:

    uci_data/power/data.npy            (POWER,     d=6 after preprocessing)
    uci_data/gas/ethylene_CO.pickle    (GAS,       d=8 after corr-pruning)
    uci_data/miniboone/data.npy        (MINIBOONE, d=42)

Canonical source: the MAF paper's data release,
    https://zenodo.org/record/1161203/files/data.tar.gz
(George Papamakarios, "Masked Autoregressive Flow for Density Estimation",
data release; the Zenodo record page publishes the archive checksum — verify
the printed sha256 against it). The tarball contains ``data/power/data.npy``,
``data/gas/ethylene_CO.pickle``, ``data/miniboone/data.npy`` among others.

Usage:
    python tools/fetch_uci.py                  # download + extract + validate
    python tools/fetch_uci.py --from-tar data.tar.gz   # offline tarball
    python tools/fetch_uci.py --validate-only  # check an existing uci_data/

This environment has no network egress: the download path fails fast with a
clear message instead of hanging, and ``--from-tar`` covers the sneakernet
case. After extraction the script validates by running the actual
``hint_tpu.data.uci`` preprocessing and checking the post-split dimensions
(6/8/42) the reference trains on (run_uci_experiments.py:9).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tarfile

ZENODO_URL = "https://zenodo.org/record/1161203/files/data.tar.gz"

# tarball member -> target path under --root
MEMBERS = {
    "data/power/data.npy": "uci_data/power/data.npy",
    "data/gas/ethylene_CO.pickle": "uci_data/gas/ethylene_CO.pickle",
    "data/miniboone/data.npy": "uci_data/miniboone/data.npy",
}

# post-preprocessing dimensionality the reference trains on
# (reference data.py:291,355,423; configs uci_data.*)
EXPECTED_DIMS = {"power": 6, "gas": 8, "miniboone": 42}


def sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def download(url: str, out: str, timeout: float = 30.0) -> str:
    import urllib.error
    import urllib.request

    print(f"downloading {url} -> {out}")
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(out, "wb") as f:
            total = 0
            while True:
                b = r.read(1 << 20)
                if not b:
                    break
                f.write(b)
                total += len(b)
                print(f"\r  {total / 1e6:.0f} MB", end="", flush=True)
            print()
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        sys.exit(
            f"download failed: {e}\n"
            f"This environment likely has no network egress. Obtain the MAF "
            f"data release ({url}) on a connected machine, then run:\n"
            f"    python tools/fetch_uci.py --from-tar data.tar.gz"
        )
    return out


def extract(tar_path: str, root: str) -> None:
    print(f"sha256(data.tar.gz) = {sha256(tar_path)}")
    print("  ^ cross-check against the checksum on the Zenodo record page")
    with tarfile.open(tar_path, "r:gz") as tf:
        names = set(tf.getnames())
        missing = [m for m in MEMBERS if m not in names]
        if missing:
            sys.exit(f"tarball is missing expected members: {missing}")
        for member, target in MEMBERS.items():
            dst = os.path.join(root, target)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with tf.extractfile(member) as src, open(dst, "wb") as out:
                out.write(src.read())
            print(f"  extracted {member} -> {dst} ({sha256(dst)[:16]}...)")


def validate(root: str) -> int:
    """Run the real preprocessing on whatever is present; report dims."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hint_tpu.data.loaders import prepare_uci_data

    present = {
        name: os.path.exists(os.path.join(root, path))
        for name, path in (
            ("power", "uci_data/power/data.npy"),
            ("gas", "uci_data/gas/ethylene_CO.pickle"),
            ("miniboone", "uci_data/miniboone/data.npy"),
        )
    }
    rc = 0
    for name, ok in present.items():
        if not ok:
            print(f"{name}: MISSING")
            rc = 1
            continue
        try:
            (x_tr, _), (x_te, _) = prepare_uci_data(name, root)
        except Exception as e:
            # malformed/wrong-shape raw file: the preprocessing raises
            print(f"{name}: INVALID ({type(e).__name__}: {e})")
            rc = 1
            continue
        d = x_tr.shape[1]
        status = "ok" if d == EXPECTED_DIMS[name] else f"WRONG DIM (want {EXPECTED_DIMS[name]})"
        print(f"{name}: d={d} train={x_tr.shape[0]} test={x_te.shape[0]} -> {status}")
        if d != EXPECTED_DIMS[name]:
            rc = 1
    if rc == 0 and all(present.values()):
        print("all three datasets validated; run the sweep with:")
        print("    python -m hint_tpu.experiments.campaign uci")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default=".", help="directory that holds uci_data/")
    ap.add_argument("--from-tar", default="", help="use a local data.tar.gz instead of downloading")
    ap.add_argument("--validate-only", action="store_true")
    ap.add_argument("--url", default=ZENODO_URL)
    args = ap.parse_args()

    if not args.validate_only:
        tar_path = args.from_tar
        if not tar_path:
            tar_path = os.path.join(args.root, "data.tar.gz")
            download(args.url, tar_path)
        if not os.path.exists(tar_path):
            sys.exit(f"no such tarball: {tar_path}")
        extract(tar_path, args.root)
    return validate(args.root)


if __name__ == "__main__":
    sys.exit(main())
