"""Worker process for the REAL 2-process distributed test (VERDICT r3 #4).

Launched by tests/test_distributed_2proc.py, one subprocess per rank:
``jax.distributed.initialize`` over localhost (the comm-backend layer,
SURVEY.md §2.8), CPU backend with 2 forced host devices per process →
a 4-device global mesh across 2 OS processes. Runs the full Solver
lifecycle: sharded train epoch (make_array_from_process_local_data path),
sharded eval with the allgather_pickled merge, and the process-0-guarded
checkpoint save. Everything the fake-injected tests approximate, for real.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--cfg", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the axon TPU plugin outranks the env var; force via config too
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * args.nprocs, jax.devices()

    from jax.experimental import multihost_utils

    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.solver import Solver

    cfg = cfg_from_file(args.cfg)
    solver = Solver(cfg)
    solver.train_model()
    # both ranks reach here before either exits (a lone early exit would
    # tear down the coordinator under the peer)
    multihost_utils.sync_global_devices("train_model done")
    mAP = solver.test_model()
    print(f"WORKER_OK pid={args.pid} mAP={mAP:.4f}", flush=True)
    multihost_utils.sync_global_devices("all done")


if __name__ == "__main__":
    main()
