"""Two-PROCESS (not just two-device) multihost plumbing test.

Spawns two real processes joined via jax.distributed over localhost —
the CPU stand-in for a 2-host TPU pod — and verifies:

  * Loader process sharding: each process sees only its slice of the
    global batch order (DistributedSampler analog);
  * utils.runtime.shard_batch assembles the correct GLOBAL array from
    process-local data (jax.make_array_from_process_local_data);
  * a jitted psum over the global batch matches the single-process sum;
  * parallel.multihost.gather_objects round-trips python objects.

Reference analog: tools/dist_train.sh + MMDistributedDataParallel
(apis/train.py:227-231) and multi_gpu_test result collection.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import os, sys, pickle
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]
# the env var alone no longer outranks an ambient accelerator plugin,
# and the XLA_FLAGS host-device-count flag is inert on jax 0.9: pin
# both through the live config before any backend initialises
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from ocrfdet_tpu.utils.runtime import shard_batch
from ocrfdet_tpu.parallel.multihost import gather_objects

mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "space"))

# global batch 8, this process's contiguous slice of 4 rows
lo = pid * 4
local = {"x": np.arange(lo, lo + 4, dtype=np.float32).reshape(4, 1),
         "s": np.float32(3.0)}
dev = shard_batch(mesh, local)
assert dev["x"].shape == (8, 1), dev["x"].shape

total = jax.jit(lambda b: b["x"].sum() * b["s"])(dev)
expect = float(np.arange(8).sum() * 3.0)
assert abs(float(total) - expect) < 1e-6, (float(total), expect)

objs = gather_objects({"rank": pid, "payload": "x" * (10 + pid * 100)})
assert [o["rank"] for o in objs] == [0, 1]
assert len(objs[1]["payload"]) == 110

# Loader slice logic (numpy-only; no dataset needed)
from ocrfdet_tpu.data.dataset import Loader
class _DS:
    class cfg: seed = 0
    def __len__(self): return 16
    def sample(self, i, epoch): return {"i": np.asarray([i])}
ld = Loader(_DS(), batch_size=8, shuffle=False, num_workers=2,
            process_index=pid, process_count=2)
b0 = next(ld.epoch(0))
got = sorted(int(v) for v in np.asarray(b0["i"]).ravel())
assert got == list(range(lo, lo + 4)), got
print(f"WORKER_{pid}_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _spawn_workers(script, repo):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_shard_and_gather(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    # the worker resolves the repo root from its own path; copy trick:
    # point it at the real repo by running from the repo root instead
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the 2-process coordination-service bootstrap can flake when the
    # host is saturated (worker B misses the join window and worker A
    # observes process_count == 1); one clean retry distinguishes a
    # real plumbing regression from scheduler starvation
    for attempt in range(2):
        procs, outs = _spawn_workers(script, repo)
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_{i}_OK" in out, out
