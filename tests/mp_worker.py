"""Subprocess worker for tests/test_multiprocess.py.

Launched N times as real separate JAX processes (CPU backend) joined
through `jax.distributed.initialize` over localhost — the DCN analogue of
the reference's `torch.distributed.init_process_group` multi-host launch
(`/root/reference/main_prog.py:330-360`). Each worker exercises the
load-bearing synchronized-decision paths (SURVEY §2.4) and prints one
JSON line for the parent test to cross-check:

  * `sync_decision`: every process proposes a DIFFERENT local best; the
    broadcast must make all of them adopt process 0's proposal
    (reference: implicit via same-seed sampling + dist.broadcast).
  * per-host loader sharding: all processes derive the same global
    permutation and take disjoint strided shards (DistributedSampler
    analogue, data/loader.py:133-144).
  * the supernet sampling RNG (np.random.RandomState(epoch)) — identical
    (r, l) draws on every host (prog/autogrow.py:194).
"""

import json
import os
import sys


def main() -> None:
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from autoprog_tpu.prog import autogrow
    from autoprog_tpu.data.loader import Loader

    # different proposal per process: only a real broadcast reconciles them
    synced = autogrow.sync_decision(128 + 32 * pid, 9 + 3 * pid)

    class _IndexOnly:
        """len()-only dataset stand-in (the sampler never loads data)."""

        def __len__(self):
            return 103

    loader = Loader(_IndexOnly(), batch_size=4, is_training=True,
                    transform=None, num_workers=0, seed=7,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    loader.set_epoch(3)
    shard = loader._indices().tolist()
    shard_again = loader._indices().tolist()

    sampler = np.random.RandomState(3)
    cfgs = [int(sampler.choice([9, 12, 15])) for _ in range(20)]

    print("RESULT " + json.dumps({
        "pid": pid,
        "nproc": jax.process_count(),
        "synced": list(synced),
        "shard": shard,
        "shard_again": shard_again,
        "cfgs": cfgs,
    }), flush=True)


if __name__ == "__main__":
    main()
