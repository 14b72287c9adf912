"""Subprocess entry for the 2-process cluster tests
(tests/test_distributed_cluster.py).

Modes:
  jaxdist <coord_port> <process_id> <num_processes>
      jax.distributed over localhost DCN: global mesh spanning both
      processes, one jitted cross-host reduction, prints
      "DIST_OK sum=<v> devices=<n>" on success.
  serve <http_port>
      tiny random-model engine + OpenAI frontend over this process's
      (host-local) device subset — one DP worker of the multi-host
      serving topology (parallel/distributed.py docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode = sys.argv[1]
    if mode == "jaxdist":
        coord_port, pid, nproc = sys.argv[2], int(sys.argv[3]), \
            int(sys.argv[4])
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=4")
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ferrum_tpu.parallel.distributed import initialize_multihost
        initialize_multihost(
            coordinator_address=f"127.0.0.1:{coord_port}",
            num_processes=nproc, process_id=pid)
        import numpy as np
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        assert jax.process_count() == nproc, jax.process_count()
        n_dev = jax.device_count()
        devs = np.array(jax.devices()).reshape(nproc, -1)
        mesh = Mesh(devs, ("host", "local"))
        gshape = (n_dev, 8)
        base = np.arange(gshape[0] * gshape[1],
                         dtype=np.float32).reshape(gshape)
        sh = NamedSharding(mesh, P(("host", "local"), None))
        arr = jax.make_array_from_callback(gshape, sh,
                                           lambda idx: base[idx])
        f = jax.jit(lambda x: jnp.sum(x, axis=0),
                    out_shardings=NamedSharding(mesh, P(None)))
        out = f(arr)          # row-sharded sum -> cross-host all-reduce
        got = np.asarray(out.addressable_data(0))
        want = base.sum(axis=0)
        assert np.allclose(got, want), (got, want)
        print(f"DIST_OK sum={float(got.sum())} devices={n_dev}",
              flush=True)
        return 0

    if mode == "serve":
        port = sys.argv[2]
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ferrum_tpu.cli import main as cli_main
        return cli_main([
            "serve", "random:tiny-test", "--port", port,
            "--kv-capacity", "64", "--max-model-len", "256",
            "--max-num-seqs", "4"])

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    raise SystemExit(main())
