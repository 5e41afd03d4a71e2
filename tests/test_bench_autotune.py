"""bench.py autotune plumbing (mocked children — no device needed).

The driver parses the LAST stdout line of `python bench.py`, so these
tests pin the invariants that protect the flagship number: winner
selection, fail-soft candidates, timeout short-circuits, and
flagship-measured-first / printed-last ordering."""

import json
import subprocess

import pytest


@pytest.fixture()
def bench(monkeypatch):
    import time

    import bench as b

    # the deadline clock starts at module import; reset it per-test so a
    # long pytest session doesn't land here with the budget already spent
    monkeypatch.setattr(b, "_START", time.monotonic())
    # device-suspect latch must not leak between tests
    monkeypatch.setattr(b, "_device_suspect", False)
    # default to warm-cache scheduling (the full candidate sweep); cold-mode
    # tests override this explicitly
    monkeypatch.setattr(b, "_cache_is_warm", lambda: True)
    return b


def _fake_child(values, timeouts=(), failures=()):
    def child(cmd, env=None, timeout=600):
        if "--candidate" in cmd:
            name = cmd[cmd.index("--candidate") + 1]
            if name in timeouts:
                raise subprocess.TimeoutExpired(cmd, timeout)
            if name in failures:
                raise RuntimeError("boom")
            return json.dumps({"candidate": name, "value": values[name]}) + "\n"
        if "--eval-candidate" in cmd:
            name = cmd[cmd.index("--eval-candidate") + 1]
            return json.dumps({"candidate": name, "value": 1e6, "fps": 0.5}) + "\n"
        if "--row" in cmd:
            row = cmd[cmd.index("--row") + 1]
            if row in timeouts:
                raise subprocess.TimeoutExpired(cmd, timeout)
            return (
                json.dumps({"metric": f"row_{row}", "value": 1.0,
                            "unit": "rays/s", "vs_baseline": 0.0}) + "\n"
            )
        raise AssertionError(cmd)

    return child


def test_winner_selection_and_fail_soft(bench, monkeypatch, capsys):
    vals = {n: 100000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    vals["fray-base"] = 222222.0
    monkeypatch.setattr(
        bench, "_run_child", _fake_child(vals, failures={"fray-field"})
    )
    line, _ = bench._run_flagship_candidates("m", "train_rays_per_sec", 5)
    d = json.loads(line)
    assert d["value"] == 222222.0
    assert "winner=fray-base" in d["note"]
    assert "fray-field" not in d["note"].split("[")[1]  # failed candidate absent


def test_candidate_timeout_probes_then_continues(bench, monkeypatch):
    """A fused-candidate timeout must NOT kill the sweep when the device
    probe says the TPU is alive (r3's break-on-timeout heuristic was
    disproven within its own run)."""
    vals = {n: 100000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    tried = []
    inner = _fake_child(vals, timeouts={"fray-base"})

    def spy(cmd, env=None, timeout=600):
        if "--candidate" in cmd:
            tried.append(cmd[cmd.index("--candidate") + 1])
        return inner(cmd, env, timeout)

    monkeypatch.setattr(bench, "_run_child", spy)
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: True)
    line, _ = bench._run_flagship_candidates("m", "train_rays_per_sec", 5)
    assert tried == [n for n, _ in bench._FLAGSHIP_CANDIDATES]
    assert json.loads(line)["value"] == 100000.0


def test_candidate_timeout_dead_device_stops_sweep(bench, monkeypatch):
    vals = {n: 100000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    tried = []
    inner = _fake_child(vals, timeouts={"fray-base"})

    def spy(cmd, env=None, timeout=600):
        if "--candidate" in cmd:
            tried.append(cmd[cmd.index("--candidate") + 1])
        return inner(cmd, env, timeout)

    monkeypatch.setattr(bench, "_run_child", spy)
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: False)
    line, _ = bench._run_flagship_candidates("m", "train_rays_per_sec", 5)
    # dead probe stops the sweep at the first timed-out candidate
    assert tried == ["default", "kernel-tuned", "fray-base"]
    assert json.loads(line)["value"] == 100000.0  # default still wins


def test_no_candidate_completed_returns_none(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "_run_child",
        _fake_child({}, failures={n for n, _ in bench._FLAGSHIP_CANDIDATES}),
    )
    assert bench._run_flagship_candidates("m", "train_rays_per_sec", 5)[0] is None


def test_budget_exhaustion_skips_candidates(bench, monkeypatch):
    """Once the deadline is near, remaining candidates are skipped — the
    scheduler must never start a child it cannot afford to wait for."""
    tried = []
    vals = {n: 100000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}

    def spy(cmd, env=None, timeout=600):
        if "--candidate" in cmd:
            tried.append(cmd[cmd.index("--candidate") + 1])
        return _fake_child(vals)(cmd, env, timeout)

    monkeypatch.setattr(bench, "_run_child", spy)
    monkeypatch.setattr(bench, "_remaining", lambda: 25.0)
    line, _ = bench._run_flagship_candidates("m", "train_rays_per_sec", 5)
    assert tried == [] and line is None


@pytest.mark.slow
def test_datapath_row_runs_end_to_end(bench):
    """The datapath row (real PrefetchingDataManager + sampler + train step)
    must execute end-to-end, not just be wired into main() — exercised at
    tiny shapes on CPU."""
    value = bench._measure_datapath(
        "thermal-nerfacto-tpu", n_steps=2, num_pairs=2, hw=(36, 48),
        num_rays=64,
    )
    assert value > 0


def test_main_prints_flagship_last(bench, monkeypatch, capsys):
    vals = {n: 150000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    monkeypatch.setattr(bench, "_run_child", _fake_child(vals))
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: True)
    bench.main()
    lines = [
        json.loads(ln) for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    assert lines, "no JSON emitted"
    assert lines[-1]["metric"] == "train_rays_per_sec"
    assert lines[-1]["value"] == 150000.0
    # the other rows came before it
    assert {l["metric"] for l in lines[:-1]} >= {
        "row_hash", "row_parity", "row_datapath", "test_rays_per_sec_1080p"
    }


def test_main_dead_device_exits_cleanly(bench, monkeypatch, capsys):
    """A wedged tunnel at t=0 must not burn candidate caps hanging in
    children: main() waits for recovery, then (still dead, budget low)
    skips every measurement and exits rc-0 with only comment lines."""
    called = []
    monkeypatch.setattr(
        bench, "_run_child",
        lambda *a, **k: called.append(a) or (_ for _ in ()).throw(
            AssertionError("no child may start on a dead device")
        ),
    )
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: False)
    monkeypatch.setattr(bench, "_remaining", lambda: 100.0)  # below wait floor
    bench.main()
    out = capsys.readouterr().out
    assert called == []
    assert not [ln for ln in out.splitlines() if ln.startswith("{")]
    assert "device unreachable" in out


def test_wait_for_device_recovers_mid_window(bench, monkeypatch):
    probes = iter([False, False, True])
    monkeypatch.setattr(
        bench, "_probe_device", lambda timeout=30.0: next(probes)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_device() is True


def test_main_row_timeout_still_prints_flagship(bench, monkeypatch, capsys):
    vals = {n: 150000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    monkeypatch.setattr(
        bench, "_run_child", _fake_child(vals, timeouts={"hash"})
    )
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: True)
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ]
    assert json.loads(lines[-1])["metric"] == "train_rays_per_sec"


def test_sigterm_mid_row_still_prints_flagship_last():
    """The driver kills with SIGTERM (timeout's default), and Python skips
    finally blocks on SIGTERM — r3's kill lost the flagship line this way.
    main() installs a handler converting it to SystemExit, so the
    best-so-far flagship line still prints LAST."""
    import subprocess
    import sys

    code = r"""
import json, os, signal, sys, time
sys.path.insert(0, %r)
import bench
bench._cache_is_warm = lambda: True
bench._probe_device = lambda timeout=30.0: True
def fake_child(cmd, env=None, timeout=600):
    if "--candidate" in cmd:
        name = cmd[cmd.index("--candidate") + 1]
        return json.dumps({"candidate": name, "value": 123456.0}) + "\n"
    os.kill(os.getpid(), signal.SIGTERM)  # driver kill mid-row
    time.sleep(30)
bench._run_child = fake_child
bench.main()
""" % (str(__import__("pathlib").Path(__file__).resolve().parents[1]),)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON printed; stderr:\n{r.stderr[-500:]}"
    last = json.loads(lines[-1])
    assert last["metric"] == "train_rays_per_sec"
    assert last["value"] == 123456.0
    assert r.returncode == 143


def test_child_runner_terminates_on_timeout(bench):
    import sys

    with pytest.raises(subprocess.TimeoutExpired):
        bench._run_child(
            [sys.executable, "-c", "import time; time.sleep(60)"], timeout=1
        )


def test_dead_probe_mid_sweep_gates_later_rows(bench, monkeypatch, capsys):
    """Once a timeout + failed probe marks the device suspect, main() must
    NOT keep spawning row children against the wedged tunnel (r4 review
    fix: SIGTERM'ing device-init-hung children worsens the wedge). It
    re-enters the recovery wait; if the device never recovers inside the
    budget, every row is skipped and no child is spawned."""
    spawned = []

    def child(cmd, env=None, timeout=600):
        spawned.append(cmd)
        if "--candidate" in cmd:
            raise subprocess.TimeoutExpired(cmd, timeout)
        raise AssertionError(f"row child spawned on suspect device: {cmd}")

    monkeypatch.setattr(bench, "_run_child", child)
    # device healthy at the start-of-run probe, wedged from then on
    probes = {"n": 0}

    def probe(timeout=30.0):
        probes["n"] += 1
        return probes["n"] == 1

    monkeypatch.setattr(bench, "_probe_device", probe)
    # decaying budget so the recovery wait loops terminate
    clock = {"left": 900.0}

    def remaining():
        clock["left"] -= 40.0
        return clock["left"]

    monkeypatch.setattr(bench, "_remaining", remaining)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    out = capsys.readouterr().out
    # only the first candidate child ran; everything after was gated
    assert [c for c in spawned if "--candidate" in c] and len(spawned) == 1
    assert not [ln for ln in out.splitlines() if ln.startswith("{")]


def test_cold_cache_skips_fused_candidates(bench, monkeypatch):
    """With no WARM stamp the fused candidates' cold compiles cannot fit
    their caps; only the robust default may run (a child SIGTERM'd
    mid-compile is the known tunnel wedge)."""
    tried = []
    vals = {n: 100000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}

    def spy(cmd, env=None, timeout=600):
        if "--candidate" in cmd:
            tried.append(cmd[cmd.index("--candidate") + 1])
        return _fake_child(vals)(cmd, env, timeout)

    monkeypatch.setattr(bench, "_run_child", spy)
    line, winner = bench._run_flagship_candidates(
        "m", "train_rays_per_sec", 5, warm=False
    )
    assert tried == ["default"]
    assert winner == "default"
    assert json.loads(line)["value"] == 100000.0


def test_cold_cache_default_needs_full_compile_budget(bench, monkeypatch):
    """Cold mode must not start even the default child without enough
    budget for its full cold compile (~186 s measured)."""
    tried = []

    def spy(cmd, env=None, timeout=600):
        tried.append(cmd)
        return _fake_child(
            {n: 1.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
        )(cmd, env, timeout)

    monkeypatch.setattr(bench, "_run_child", spy)
    monkeypatch.setattr(bench, "_remaining", lambda: 200.0)  # < 220 floor
    line, _ = bench._run_flagship_candidates(
        "m", "train_rays_per_sec", 5, warm=False
    )
    assert tried == [] and line is None


def test_cold_main_still_prints_flagship_and_parity(bench, monkeypatch, capsys):
    """Cold-mode main(): flagship default + parity row run; fused and eval
    candidates are skipped; flagship prints last."""
    vals = {n: 150000.0 for n, _ in bench._FLAGSHIP_CANDIDATES}
    monkeypatch.setattr(bench, "_cache_is_warm", lambda: False)
    monkeypatch.setattr(bench, "_run_child", _fake_child(vals))
    monkeypatch.setattr(bench, "_probe_device", lambda timeout=30.0: True)
    bench.main()
    out = capsys.readouterr().out
    lines = [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]
    assert lines[-1]["metric"] == "train_rays_per_sec"
    assert "row_parity" in {l["metric"] for l in lines[:-1]}
    assert "cache COLD" in out
    assert "fused candidates skipped (cold compile cache)" in out


def test_warm_stamp_roundtrip(tmp_path, monkeypatch):
    # no fixture: this test needs the REAL _cache_is_warm
    import bench as b

    monkeypatch.setattr(b, "_PCC_DIR", str(tmp_path))
    monkeypatch.setattr(b, "_STAMP_PATH", str(tmp_path / "WARM_STAMP"))
    # no stamp -> cold
    assert b._cache_is_warm() is False
    b._write_cache_stamp()
    assert b._cache_is_warm() is True
    # stale stamp -> cold
    (tmp_path / "WARM_STAMP").write_text("deadbeef")
    assert b._cache_is_warm() is False


def test_child_runner_surfaces_crash_stderr(bench):
    """A crashed child (no JSON on stdout) must raise with its stderr tail —
    the r3 Mosaic bf16-precision crash was invisible until this existed."""
    import sys

    with pytest.raises(RuntimeError, match="KeyError.*mosaic-ish"):
        bench._run_child(
            [
                sys.executable, "-c",
                "import sys; print('not json'); raise KeyError('mosaic-ish')",
            ],
            timeout=30,
        )
