"""Platform selection shim.

The bundled TPU plugin ignores the `JAX_PLATFORMS` environment variable
during discovery; route it through `jax.config` (which is honored) so
`JAX_PLATFORMS=cpu python main.py ...` works as documented. Must run
before the first JAX computation.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if plats:
        import jax
        jax.config.update("jax_platforms", plats)
    enable_compilation_cache()


def ensure_backend_alive(timeout: float = 0.0) -> None:
    """Fail fast (RuntimeError) instead of hanging when the accelerator
    backend is unreachable.

    Initializing JAX against a dead TPU tunnel blocks ~25 min per attempt
    (observed round 3: BENCH/MULTICHIP rc=124). This probes the backend in
    a THROWAWAY subprocess with a hard deadline before the caller commits
    its own process to `jax.devices()`. The probe is skipped when:
      - the platform is forced to cpu (nothing remote to probe), or
      - JAX already has live backends in this process (probing then would
        violate the one-TPU-client-at-a-time constraint), or
      - AUTOPROG_NO_LIVENESS_PROBE=1.

    The deadline adapts to a cheap TCP check of the tunnel relay port
    (AUTOPROG_RELAY_PORT, default 8082; 0 disables the check): a DEAD
    relay refuses the connect, so the short 120 s deadline is plenty to
    report it, while an OPEN port means the relay is alive and the init
    is merely slow — a healthy cold init has been observed anywhere from
    ~60 s to ~470 s (round-4, fresh container + cold compile cache), so
    a patient 900 s deadline is used rather than misdiagnosing a slow
    backend as dead and forfeiting the benchmark. Override everything
    with AUTOPROG_LIVENESS_TIMEOUT."""
    import socket
    import subprocess
    import sys

    if os.environ.get("AUTOPROG_NO_LIVENESS_PROBE") == "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    if "jax" in sys.modules:
        try:
            import jax
            if (jax.config.jax_platforms or "").strip().lower() == "cpu":
                return  # platform forced to cpu via jax.config
            from jax._src import xla_bridge
            if getattr(xla_bridge, "_backends", None):
                return  # backend already up in-process: provably alive
        except Exception:
            pass
    if not timeout:
        try:
            port = int(os.environ.get("AUTOPROG_RELAY_PORT", "8082"))
        except ValueError:
            port = 8082  # malformed override degrades to the default
        relay_open = False
        if port:
            try:
                socket.create_connection(("127.0.0.1", port), 2).close()
                relay_open = True
            except OSError:
                pass
        timeout = 900.0 if relay_open else 120.0
    timeout = float(os.environ.get("AUTOPROG_LIVENESS_TIMEOUT", timeout))
    code = ("import jax\n"
            "print('AUTOPROG_BACKEND_OK', len(jax.devices()),"
            " jax.devices()[0].platform)\n")
    import tempfile
    out = tempfile.NamedTemporaryFile(
        mode="w+", prefix="autoprog_probe_", suffix=".log", delete=False)
    # NEVER kill a process that is initializing the TPU client — SIGKILL
    # mid-init wedges the tunnel ~20-30 min for the NEXT client (project
    # rule). On timeout the probe is ABANDONED instead: if the tunnel was
    # merely slow it finishes, prints, and exits on its own; if dead it
    # blocks forever holding nothing but a pid.
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=out, stderr=subprocess.STDOUT)
    try:
        rc = proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"accelerator backend did not initialize within {timeout:.0f}s "
            f"— TPU tunnel/relay presumed dead (probe pid {proc.pid} "
            f"abandoned, log {out.name}; set JAX_PLATFORMS=cpu to run on "
            "host, or AUTOPROG_NO_LIVENESS_PROBE=1 to skip this check)")
    out.seek(0)
    text = out.read()
    if rc != 0 or "AUTOPROG_BACKEND_OK" not in text:
        tail = text.strip().splitlines()[-5:]
        raise RuntimeError(
            "accelerator backend probe failed rc=%d: %s"
            % (rc, " | ".join(tail)))


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache (reference analogue: cuDNN
    autotune cache + torch.compile caches). First compiles of the VOLO
    programs cost 20-40 s each through the TPU tunnel and recur on every
    process start; the persistent cache makes warm starts ~instant.
    Opt out with AUTOPROG_NO_COMPILE_CACHE=1."""
    if os.environ.get("AUTOPROG_NO_COMPILE_CACHE") == "1":
        return
    if not path:
        # one cache dir per requested platform: under the remote-compile
        # tunnel, CPU AOT results can be compiled with machine features
        # that differ from the local host's (XLA warns about potential
        # SIGILL when loading them) — keep cpu/tpu entries apart
        plat = os.environ.get("JAX_PLATFORMS", "").strip() or "default"
        path = os.environ.get(
            "AUTOPROG_COMPILE_CACHE",
            os.path.expanduser(f"~/.cache/autoprog_tpu/xla-{plat}"))
    try:
        import jax
        if jax.process_count() > 1:
            # per-process dirs in multi-process runs: programs compile
            # against different device ids per process, so a SHARED dir
            # hits for one process (entries from its previous runs) and
            # misses for the others — the resulting minutes-long compile
            # skew trips Gloo's ~30 s context-init window at the first
            # collective. Separate dirs keep every process's hit/miss
            # pattern identical, so they stay in natural lockstep.
            path = os.path.join(path, f"proc{jax.process_index()}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization, never a failure mode
