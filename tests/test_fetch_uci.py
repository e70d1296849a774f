"""tools/fetch_uci.py: the offline (--from-tar) path end-to-end with a
crafted MAF-layout tarball, plus the validate-only diagnostics.

Crafted data is shaped so the real preprocessing yields the reference
dimensionalities (power 8->6 after the two column deletes, gas 8 kept
columns, miniboone 43->42 after the last-column drop) — the same gate the
tool applies to the real download."""

import importlib.util
import io
import os
import sys
import tarfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "fetch_uci", os.path.join(REPO, "tools", "fetch_uci.py")
)
fetch_uci = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fetch_uci)


def _maf_tarball(tmp_path):
    pd = pytest.importorskip("pandas")
    rng = np.random.RandomState(0)
    # power: raw (n, 8); preprocessing deletes columns 3 then 1 -> d=6
    power = rng.rand(300, 8)
    # gas: Meth/Eth/Time dropped unconditionally; 8 independent feature
    # columns, nothing crosses the 0.98 corr-prune threshold -> d=8
    gas = pd.DataFrame({"Meth": rng.rand(300), "Eth": rng.rand(300),
                        "Time": np.arange(300.0)})
    for i in range(8):
        gas[f"F{i}"] = rng.randn(300)
    # miniboone: last column dropped after normalization -> d=42
    mini = rng.randn(300, 43)

    tar_path = tmp_path / "data.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        def add(name, payload):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

        buf = io.BytesIO(); np.save(buf, power)
        add("data/power/data.npy", buf.getvalue())
        buf = io.BytesIO(); gas.to_pickle(buf)
        add("data/gas/ethylene_CO.pickle", buf.getvalue())
        buf = io.BytesIO(); np.save(buf, mini)
        add("data/miniboone/data.npy", buf.getvalue())
    return str(tar_path)


def test_from_tar_extract_and_validate(tmp_path, monkeypatch, capsys):
    tar = _maf_tarball(tmp_path)
    root = tmp_path / "root"
    root.mkdir()
    monkeypatch.setattr(
        sys, "argv", ["fetch_uci.py", "--from-tar", tar, "--root", str(root)]
    )
    assert fetch_uci.main() == 0
    out = capsys.readouterr().out
    assert "sha256(data.tar.gz)" in out
    for name, d in (("power", 6), ("gas", 8), ("miniboone", 42)):
        assert f"{name}: d={d}" in out
    # files landed in the reference layout the loaders expect
    for p in fetch_uci.MEMBERS.values():
        assert (root / p).exists()
    # the one-command sweep hint only prints when everything validates
    assert "campaign uci" in out


def test_validate_only_reports_missing(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(
        sys, "argv", ["fetch_uci.py", "--validate-only", "--root", str(tmp_path)]
    )
    assert fetch_uci.main() == 1
    out = capsys.readouterr().out
    for name in ("power", "gas", "miniboone"):
        assert f"{name}: MISSING" in out


def test_malformed_file_fails_validation(tmp_path, monkeypatch, capsys):
    # a power file the preprocessing chokes on (7 columns: the noise hstack
    # no longer lines up) must be reported, not crash the tool
    root = tmp_path
    os.makedirs(root / "uci_data/power")
    np.save(root / "uci_data/power/data.npy", np.random.RandomState(1).rand(300, 7))
    monkeypatch.setattr(
        sys, "argv", ["fetch_uci.py", "--validate-only", "--root", str(root)]
    )
    assert fetch_uci.main() == 1
    assert "power: INVALID" in capsys.readouterr().out


def test_wrong_dim_fails_validation(tmp_path, monkeypatch, capsys):
    # a miniboone file that loads fine but yields the wrong dimensionality
    root = tmp_path
    os.makedirs(root / "uci_data/miniboone")
    np.save(root / "uci_data/miniboone/data.npy", np.random.RandomState(1).randn(300, 20))
    monkeypatch.setattr(
        sys, "argv", ["fetch_uci.py", "--validate-only", "--root", str(root)]
    )
    assert fetch_uci.main() == 1
    assert "WRONG DIM" in capsys.readouterr().out


def test_missing_tarball_member_rejected(tmp_path, monkeypatch):
    tar_path = tmp_path / "bad.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        info = tarfile.TarInfo("data/power/data.npy")
        buf = io.BytesIO(); np.save(buf, np.zeros((4, 8)))
        info.size = len(buf.getvalue())
        tf.addfile(info, io.BytesIO(buf.getvalue()))
    monkeypatch.setattr(
        sys, "argv", ["fetch_uci.py", "--from-tar", str(tar_path), "--root", str(tmp_path)]
    )
    with pytest.raises(SystemExit, match="missing expected members"):
        fetch_uci.main()
