"""Real 2-process `jax.distributed` smoke test (SURVEY.md §4.2 'multi-host
smoke'; VERDICT.md r1 #7): the only way this sandbox can execute
`sharding.bringup`'s `jax.distributed.initialize` branch.

Spawns two CPU subprocesses wired through a localhost coordinator; each runs
bringup(), builds the global 2-device mesh, and runs the a2a + psum lookup
exchanges across the process boundary, checking against a local numpy
reference. Skipped (not failed) if the sandbox blocks localhost sockets.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), sys.argv[2]
from score_tpu.config import ShardingConfig
from score_tpu.sharding import bringup, make_lookup_fn, make_mesh

mesh, lookup = bringup(
    ShardingConfig(num_data=1, num_rows=2, lookup_mode="a2a"),
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from score_tpu.sharding import a2a_lookup, psum_lookup

rng = np.random.default_rng(0)        # same seed in both processes
V, d, n = 32, 8, 64
table_h = rng.normal(size=(V, d)).astype(np.float32)
ids_h = rng.integers(0, V, size=(n,)).astype(np.int32)

table = jax.make_array_from_callback(
    (V, d), NamedSharding(mesh, P("rows", None)),
    lambda idx: table_h[idx])
ids = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P(("data", "rows"))),
    lambda idx: ids_h[idx])

want = table_h[ids_h]
for fn in (a2a_lookup, psum_lookup):
    got = fn(mesh, table, ids) if fn is a2a_lookup else fn(
        mesh, table, jax.make_array_from_callback(
            (n,), NamedSharding(mesh, P("data")), lambda idx: ids_h[idx]))
    # checksum is fully-addressable (replicated-safe): sum via jnp
    chk = float(jnp.sum(got * jnp.asarray(want)))
    ref = float(np.sum(want * want))
    assert abs(chk - ref) < 1e-3 * max(abs(ref), 1.0), (fn.__name__, chk, ref)
print(f"OK {pid} {ref:.6f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bringup_and_lookup(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost sockets in this sandbox")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(port)],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed bring-up timed out (relay/port issue)")
    for rc, out in outs:
        if rc != 0 and ("UNAVAILABLE" in out or "failed to connect" in out):
            pytest.skip(f"coordinator unavailable in sandbox: {out[-200:]}")
        assert rc == 0, out
        assert "OK" in out, out
    # both processes computed the identical checksum
    chk = [o.split("OK")[1].split()[1] for _, o in outs]
    assert chk[0] == chk[1], chk
