"""Worker for tests/test_multihost.py: one simulated host of two.

Each process gets 4 virtual CPU devices; jax.distributed stitches them
into one 8-device global mesh (the fake-multihost pattern — same code
path as real DCN-connected TPU hosts). Exercises:

* parallel.sharding.init_distributed (jax.distributed bring-up)
* a global (data,) mesh over every device of every process
* data-sharded global reduction (XLA collective across processes)
* broadcast_json_from_host0 — the serving job-registry broadcast

Prints one JSON result line; the parent test asserts both processes
agree.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    pid = int(sys.argv[1])
    coord = sys.argv[2]

    from image_to_pointcloud_tpu.parallel.sharding import (
        broadcast_json_from_host0,
        init_distributed,
    )

    init_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert jax.process_count() == 2

    mesh = Mesh(np.array(devs).reshape(8), ("data",))
    y = jax.device_put(
        np.arange(16.0, dtype=np.float32).reshape(8, 2),
        NamedSharding(mesh, P("data")),
    )
    total = float(
        jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(y)
    )

    job = {"job_id": "abc-123", "status": "completed", "progress": 100}
    got = broadcast_json_from_host0(job if pid == 0 else None)

    print(
        json.dumps(
            {
                "pid": pid,
                "devices": len(devs),
                "psum_total": total,
                "job": got,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
