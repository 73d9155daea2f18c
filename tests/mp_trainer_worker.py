"""Subprocess worker for tests/test_multiprocess.py's trainer e2e case.

Runs the REAL `main_prog.main` (tiny auto-grow config, 2 stages) as one
of N JAX processes joined over localhost. Where mp_worker.py checks the
synchronized-decision *primitives*, this drives the whole trainer
through a grow boundary — the place multi-host divergence would actually
bite: every process must make the same grow decision, rebuild the same
stage model, and end with identical replicated parameters.

Prints one `RESULT {json}` line: traversed stage history + a parameter
checksum.
"""

import json
import os
import sys


def main() -> None:
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    outdir = sys.argv[4]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    from autoprog_tpu import main_prog

    argv = [
        "synthetic://", "--model", "volo_h2_l4", "--num-classes", "10",
        "--img-size", "32", "-b", "32", "--epochs", "3",
        "--warmup-epochs", "1", "--cooldown-epochs", "0", "--workers", "0",
        "--fake-data-size", "64", "--no-bf16", "--num-stages", "2",
        "--r-scale", "0.5", "--l-scale", "0.5", "--drop-path", "0.0",
        "--auto-grow", "--search-epochs", "1", "--search-probe-steps", "2",
        "--search-time-iters", "2", "--load-with-clone", "--seed", "11",
        "--output", outdir,
    ]
    main_prog.main(argv)
    ctx = main_prog.LAST_CTX

    leaves = jax.tree.leaves(ctx.state.params)
    checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float64)))
                         for x in leaves))
    history = [{k: (list(v) if isinstance(v, tuple) else v)
                for k, v in h.items()} for h in ctx.stage_history]
    print("RESULT " + json.dumps({
        "pid": pid,
        "nproc": jax.process_count(),
        "arch": ctx.mdef.name,
        "history": history,
        "checksum": round(checksum, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
