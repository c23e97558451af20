"""Multi-host (pod) run: one program, every process executes it.

On a TPU pod, launch this same script on every host (e.g. with
`gcloud ... tpu-vm ssh --worker=all`); jax.distributed auto-detects the
coordinator and the mesh spans all chips over ICI+DCN. For a local
2-process CPU rehearsal:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python examples/multihost_pod.py --coord 127.0.0.1:9911 --n 2 --pid 0 &
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python examples/multihost_pod.py --coord 127.0.0.1:9911 --n 2 --pid 1
"""

import argparse
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdmodel_tpu import SimConfig
from crdmodel_tpu.parallel import multihost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", default=None,
                    help="coordinator address (auto-detected on TPU pods)")
    ap.add_argument("--n", type=int, default=None, help="process count")
    ap.add_argument("--pid", type=int, default=None, help="process id")
    args = ap.parse_args()

    multihost.initialize(coordinator_address=args.coord,
                         num_processes=args.n, process_id=args.pid)
    lead = jax.process_index() == 0
    if lead:
        print(f"{jax.process_count()} processes, "
              f"{jax.device_count()} devices total")

    cfg = SimConfig(model="fhn", surface="torus", x_mesh=64,
                    surface_width=20.0, surface_length=80.0,
                    t_final=2.0, output_timestep=4,
                    vary_beta=1, beta_min=0.7, beta_max=1.7, t_boundary=1.0,
                    dtype="float32", rtol=1e-4, atol=1e-7)
    res = multihost.simulate_sharded_multihost(cfg, progress=lead)
    if lead:
        print(res.describe())
        assert res.ok
        print("trajectory:", np.asarray(res.trajectory).shape)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
