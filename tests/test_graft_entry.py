"""Driver-facing entry points (``__graft_entry__``).

The driver imports ``__graft_entry__`` under whatever backend the host pins
and calls ``dryrun_multichip(8)`` directly — round 1 failed because the
function required the caller to pre-set ``XLA_FLAGS``
(MULTICHIP_r01.json: ok=false). These tests pin the self-bootstrap contract:
the dry-run must succeed from an environment *without*
``xla_force_host_platform_device_count`` preset.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    """With >=8 devices already visible (conftest mesh), runs in-process."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


def test_dryrun_multichip_self_bootstraps_without_xla_flags():
    """From a 1-device env with no XLA_FLAGS, the dry-run re-execs itself."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the condition that broke round 1
    env["JAX_PLATFORMS"] = "cpu"  # stay off the TPU tunnel in CI
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(4)\n" % REPO
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4): loss=" in proc.stdout
    assert "devices=4" in proc.stdout


def test_dryrun_bootstraps_when_backend_unavailable(monkeypatch):
    """If the pinned real backend cannot initialise (e.g. the TPU tunnel is
    wedged), ``jax.devices()`` raises — the dry-run must fall through to the
    virtual-mesh bootstrap instead of crashing (observed live: axon
    UNAVAILABLE made the bare call exit rc=1)."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__

        def boom():
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE")

        calls = []
        monkeypatch.setattr(__graft_entry__.jax, "devices", boom)
        monkeypatch.setattr(__graft_entry__, "_bootstrap_virtual_mesh",
                            lambda n: calls.append(n))
        __graft_entry__.dryrun_multichip(8)
        assert calls == [8]
    finally:
        sys.path.remove(REPO)


def test_dryrun_bootstraps_when_backend_probe_hangs(monkeypatch):
    """A wedged TPU tunnel HANGS backend init (~25 min before raising,
    observed live) — the probe is a bounded daemon thread, after which the
    dry-run must proceed to the virtual-mesh bootstrap."""
    import threading
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__

        hang = threading.Event()

        def stuck():
            hang.wait(30)  # far beyond the 1 s probe bound below
            return []

        calls = []
        monkeypatch.setenv("SRBH_PROBE_TIMEOUT", "1")
        monkeypatch.setattr(__graft_entry__.jax, "devices", stuck)
        monkeypatch.setattr(__graft_entry__, "_bootstrap_virtual_mesh",
                            lambda n: calls.append(n))
        __graft_entry__.dryrun_multichip(8)
        assert calls == [8]
        hang.set()
    finally:
        sys.path.remove(REPO)
