"""bench.py supervisor: the retry-on-busy-chip logic that protects the
driver's official perf record (round-3 postmortem: BENCH_r03 was an
UNAVAILABLE traceback because a background job held the shared TPU).

The supervisor is exercised with scripted children — no TPU involved."""

import importlib.util
import json
import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _child(tmp_path, body: str) -> list:
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    return [sys.executable, str(p)]


@pytest.fixture(autouse=True)
def _fast_retries(monkeypatch):
    monkeypatch.setenv("HINT_TPU_BENCH_ATTEMPTS", "3")
    monkeypatch.setenv("HINT_TPU_BENCH_BACKOFF", "0.05")
    # never leave a stale marker behind
    yield
    if os.path.exists(bench._marker_path()):
        os.unlink(bench._marker_path())


def test_success_forwards_single_json_line(tmp_path, capsys):
    cmd = _child(tmp_path, """
        print("noise line from warmup")
        print('{"metric": "train_steps_per_sec", "value": 1.0, "unit": "steps/s", "vs_baseline": 2.0}')
    """)
    assert bench._supervise(cmd) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["vs_baseline"] == 2.0


def test_retries_unavailable_until_success(tmp_path, capsys):
    # child fails with an UNAVAILABLE-class marker twice, then succeeds
    flag = tmp_path / "count"
    cmd = _child(tmp_path, f"""
        import os, sys
        n = int(open({str(flag)!r}).read()) if os.path.exists({str(flag)!r}) else 0
        open({str(flag)!r}, "w").write(str(n + 1))
        if n < 2:
            with open(os.path.join({REPO!r}, ".bench_last_error"), "w") as f:
                f.write("JaxRuntimeError: UNAVAILABLE: TPU backend connection dropped")
            sys.exit(1)
        print('{{"metric": "m", "value": 1, "unit": "u", "vs_baseline": 1}}')
    """)
    assert bench._supervise(cmd) == 0
    assert flag.read_text() == "3"  # two failures + one success
    assert json.loads(capsys.readouterr().out.strip())["value"] == 1


def test_nonretryable_fails_immediately(tmp_path):
    flag = tmp_path / "count"
    cmd = _child(tmp_path, f"""
        import os, sys
        n = int(open({str(flag)!r}).read()) if os.path.exists({str(flag)!r}) else 0
        open({str(flag)!r}, "w").write(str(n + 1))
        with open(os.path.join({REPO!r}, ".bench_last_error"), "w") as f:
            f.write("ValueError: bogus batch size")
        sys.exit(1)
    """)
    assert bench._supervise(cmd) == 1
    assert flag.read_text() == "1"  # no retry on a non-transient error


def test_gives_up_after_attempt_budget(tmp_path):
    flag = tmp_path / "count"
    cmd = _child(tmp_path, f"""
        import os, sys
        n = int(open({str(flag)!r}).read()) if os.path.exists({str(flag)!r}) else 0
        open({str(flag)!r}, "w").write(str(n + 1))
        with open(os.path.join({REPO!r}, ".bench_last_error"), "w") as f:
            f.write("unable to initialize backend 'axon': UNAVAILABLE")
        sys.exit(1)
    """)
    assert bench._supervise(cmd) == 1
    assert flag.read_text() == "3"  # exactly ATTEMPTS tries


def test_non_json_success_output_is_rejected(tmp_path):
    cmd = _child(tmp_path, "print('not json at all')")
    with pytest.raises(json.JSONDecodeError):
        bench._supervise(cmd)
