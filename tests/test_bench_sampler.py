"""bench.py multi-process sampler logic (no TPU): best-child selection,
wedged-chip recovery (VERDICT r4 #1 — round 4's BENCH capture was lost to a
single child timeout aborting the run), adaptive fast-mode sampling
(VERDICT r4 #8), fast-failure => safe in-process fallback."""
import json
import subprocess
import sys
import types

import pytest


def _load_bench(monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    # bench.py imports jax at module level; that's fine on CPU-pinned test env
    spec.loader.exec_module(mod)
    return mod


class _Out:
    def __init__(self, stdout="", rc=0):
        self.stdout = stdout
        self.stderr = ""
        self.returncode = rc


def _line(v):
    return json.dumps(
        {"metric": "m", "value": v, "unit": "img/s/chip", "vs_baseline": v / 5000}
    )


def _is_probe(argv):
    # the recovery probe is `python -c "import jax; ..."` (bench._probe_argv)
    return isinstance(argv, (list, tuple)) and "-c" in argv


def test_best_child_wins(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)
    vals = iter([4100.0, 4600.0, 4050.0])

    def fake_run(*a, **k):
        return _Out(stdout="# noise\n" + _line(next(vals)) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["value"] == 4600.0
    assert rec["procs_sampled"] == 3
    # best + median both reported (VERDICT r3 weak #5): the headline can't
    # select favourably without the median riding along
    assert rec["value_best"] == 4600.0
    assert rec["value_median"] == 4100.0
    assert rec["vs_baseline_median"] == pytest.approx(4100.0 / 5000)
    assert [c["value"] for c in rec["children"]] == [4100.0, 4600.0, 4050.0]
    # 4600 >= threshold: no fast-mode extension
    assert "fast_mode_extension" not in rec
    assert "chip_recoveries" not in rec


def test_timeout_recovers_and_resumes(monkeypatch, capsys):
    """A child timeout triggers the CLAUDE.md recovery protocol (probe loop);
    once the chip answers, sampling RESUMES and the round still gets a
    number — round 4 lost its BENCH capture to aborting here."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_RECOVERY_BUDGET", "30")
    child_vals = iter([4400.0, 4500.0, 4350.0])
    calls = {"children": 0, "probes": 0}

    def fake_run(argv, **k):
        if _is_probe(argv):
            calls["probes"] += 1
            return _Out(stdout="8.0\n")  # chip answers
        calls["children"] += 1
        if calls["children"] == 1:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        return _Out(stdout=_line(next(child_vals)) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 4500.0
    assert rec["procs_sampled"] == 3, "recovered timeout must not eat a slot"
    assert rec["chip_recoveries"] == 1
    assert calls["probes"] >= 1
    assert calls["children"] == 4  # 1 timeout + 3 measurements


def test_recovery_failure_exits_nonzero(monkeypatch, capsys):
    """If the probe never answers within the budget and no child succeeded,
    exit non-zero (never an untimed in-process fallback on a wedged chip)."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_RECOVERY_BUDGET", "0")  # fail recovery fast
    calls = {"n": 0}

    def fake_run(argv, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    ran_main = {"v": False}
    monkeypatch.setattr(bench, "main", lambda: ran_main.__setitem__("v", True))
    with pytest.raises(SystemExit) as e:
        bench._multiproc_main(3)
    assert e.value.code == 1
    assert calls["n"] == 1, "kept poking a possibly-wedged chip"
    assert not ran_main["v"], "untimed in-process fallback after a timeout"


def test_recovery_attempts_bounded(monkeypatch, capsys):
    """Repeated wedges stop after BENCH_MAX_RECOVERIES; results so far are
    still reported."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_RECOVERY_BUDGET", "30")
    monkeypatch.setenv("BENCH_MAX_RECOVERIES", "2")
    calls = {"children": 0, "probes": 0}

    def fake_run(argv, **k):
        if _is_probe(argv):
            calls["probes"] += 1
            return _Out(stdout="8.0\n")
        calls["children"] += 1
        if calls["children"] == 1:
            return _Out(stdout=_line(4200.0) + "\n")
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 4200.0
    assert rec["procs_sampled"] == 1
    assert rec["chip_recoveries"] == 2
    # 1 success + 2 recovered timeouts + 1 final timeout that exhausts
    assert calls["children"] == 4


def test_fast_mode_extension(monkeypatch, capsys):
    """All base children in the slow bimodal mode (< threshold): sampling
    extends up to BENCH_PROCS_MAX and stops as soon as the fast mode is
    captured (VERDICT r4 #8)."""
    bench = _load_bench(monkeypatch)
    vals = iter([4100.0, 4050.0, 4120.0, 4600.0, 4590.0])

    def fake_run(*a, **k):
        return _Out(stdout=_line(next(vals)) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 4600.0
    assert rec["procs_sampled"] == 4, "stop extending once fast mode captured"
    assert rec["fast_mode_extension"] is True


def test_fast_mode_extension_capped(monkeypatch, capsys):
    """Extension is bounded by BENCH_PROCS_MAX even if the fast mode never
    shows up."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_PROCS_MAX", "5")

    def fake_run(*a, **k):
        return _Out(stdout=_line(4100.0) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["procs_sampled"] == 5
    assert rec["fast_mode_extension"] is True


def test_fast_mode_extension_bounded_on_failing_children(monkeypatch, capsys):
    """Extension children that exit non-zero (no JSON line) must still count
    toward the extension budget: the loop used to bound on len(results),
    which a failing child never grows — unbounded spawning (r5 review #1).
    The record must also NOT claim fast_mode_extension when no extension
    child actually contributed a sample (r5 review #6)."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_PROCS_MAX", "6")
    calls = {"children": 0}

    def fake_run(argv, **k):
        calls["children"] += 1
        if calls["children"] <= 3:
            return _Out(stdout=_line(4100.0) + "\n")  # slow-mode base sample
        return _Out(rc=1)  # every extension child fails

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls["children"] == 6, "extension spawns must be bounded"
    assert rec["procs_sampled"] == 3
    assert "fast_mode_extension" not in rec, (
        "no extension sample landed — the flag would misrepresent the record"
    )


def test_total_children_capped_when_base_children_fail(monkeypatch, capsys):
    """The extension budget counts completed CHILDREN, not samples: with
    failed base children, bounding on samples would run more than
    BENCH_PROCS_MAX total children (each a ~10-min TPU run)."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_PROCS_MAX", "5")
    calls = {"children": 0}

    def fake_run(argv, **k):
        calls["children"] += 1
        if calls["children"] == 1:
            return _Out(stdout=_line(4100.0) + "\n")  # one slow-mode sample
        return _Out(rc=1)  # the rest fail
    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._multiproc_main(3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls["children"] == 5, "total children must respect BENCH_PROCS_MAX"
    assert rec["procs_sampled"] == 1


def test_fast_failures_fall_back_in_process(monkeypatch):
    bench = _load_bench(monkeypatch)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Out(rc=3))
    ran_main = {"v": False}
    monkeypatch.setattr(bench, "main", lambda: ran_main.__setitem__("v", True))
    bench._multiproc_main(2)
    assert ran_main["v"], "non-timeout child failures should fall back safely"


def test_no_untimed_fallback_after_any_wedge(monkeypatch, capsys):
    """If a chip timeout happened this session — even one the probe
    recovered from — and no child produced a sample, exit non-zero instead
    of running the UNTIMED in-process fallback against a chip that already
    wedged once (r5 review; the post-wedge first client can be 23x degraded
    or wedge again)."""
    bench = _load_bench(monkeypatch)
    monkeypatch.setenv("BENCH_RECOVERY_BUDGET", "30")
    calls = {"children": 0}

    def fake_run(argv, **k):
        if _is_probe(argv):
            return _Out(stdout="8.0\n")  # recovery probe succeeds
        calls["children"] += 1
        if calls["children"] == 1:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        return _Out(rc=1)  # every later child crashes (degraded client)

    monkeypatch.setattr(subprocess, "run", fake_run)
    ran_main = {"v": False}
    monkeypatch.setattr(bench, "main", lambda: ran_main.__setitem__("v", True))
    with pytest.raises(SystemExit) as e:
        bench._multiproc_main(3)
    assert e.value.code == 1
    assert not ran_main["v"], "untimed fallback ran after a chip wedge"
