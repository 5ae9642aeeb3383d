"""Multi-host backend: REAL 2-process rendezvous over loopback DCN.

Spawns two separate Python processes that initialize jax.distributed
against a local coordinator, exchange data with a cross-host collective,
and hit a barrier — the CPU-backend analog of a 2-host pod (SURVEY.md §4:
"multi-node without a real cluster").  Also exercises failure DETECTION:
a missing host makes initialization raise within its timeout instead of
hanging.
"""

import os
import socket
import subprocess
import sys

import pytest

from simple_image_compression_network_tpu.parallel import distributed

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from simple_image_compression_network_tpu.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
assert distributed.initialize_multihost(coord, 2, pid, init_timeout=60)
assert jax.process_count() == 2
assert distributed.is_primary() == (pid == 0)

import jax.numpy as jnp
from jax.experimental import multihost_utils

# cross-host data exchange: allgather over DCN
mine = jnp.full((2,), jax.process_index() + 1, jnp.int32)
allv = multihost_utils.process_allgather(mine)
assert allv.shape == (2, 2) and int(allv.sum()) == 6, allv

# bounded-wait sync point
distributed.barrier("unit-test", timeout_s=30.0)

# idempotent-retry helper: first attempt fails, second succeeds
state = {"n": 0}
def flaky():
    state["n"] += 1
    if state["n"] == 1:
        raise RuntimeError("transient")
    return "done"
assert distributed.run_with_retry(flaky, max_retries=2,
                                  backoff_s=0.01) == "done"

print(f"HOSTOK {pid} {jax.process_count()}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # one plain CPU device per "host"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_rendezvous_and_collective():
    coord = f"127.0.0.1:{_free_port()}"
    root = os.path.join(os.path.dirname(__file__), "..")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=root, env=_env()) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"HOSTOK {pid} 2" in out, out


def test_missing_host_detected_not_hung():
    """One of two expected hosts never arrives -> bounded-time exit.

    Depending on role the runtime either raises (catchable -> DETECTED) or
    aborts with DEADLINE_EXCEEDED; both are detection — the guarantee
    under test is that a dead peer produces an error in bounded time, not
    a hang."""
    coord = f"127.0.0.1:{_free_port()}"
    root = os.path.join(os.path.dirname(__file__), "..")
    script = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from simple_image_compression_network_tpu.parallel import "
        "distributed\n"
        "try:\n"
        f"    distributed.initialize_multihost('{coord}', 2, 1, "
        "init_timeout=8)\n"
        "except Exception:\n"
        "    print('DETECTED', flush=True); sys.exit(0)\n"
        "sys.exit(1)\n")
    p = subprocess.run([sys.executable, "-c", script], cwd=root, env=_env(),
                       capture_output=True, text=True, timeout=120)
    out = p.stdout + p.stderr
    detected = (p.returncode == 0 and "DETECTED" in p.stdout) or (
        "DEADLINE_EXCEEDED" in out)
    assert detected, out


def test_single_process_noops():
    assert not distributed.initialize_multihost(None)
    distributed.barrier("noop")  # no coordinator -> no-op
    assert distributed.run_with_retry(lambda: 7) == 7


_TRAIN_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from simple_image_compression_network_tpu.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
assert distributed.initialize_multihost(coord, 2, pid, init_timeout=60)

# tiny 2-host data-parallel RD train step with the per-host input pipeline
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from simple_image_compression_network_tpu import train
from simple_image_compression_network_tpu.parallel import mesh as meshlib
from simple_image_compression_network_tpu.utils import data as datalib

cfg = train.TrainConfig(model="factorized", n=8, m=12, crop=32, batch=4)
key = jax.random.key(0)
model, params, opt_state = train.init_state(cfg, key,
                                            input_shape=(4, 32, 32, 3))
mesh = meshlib.make_mesh((2,), ("data",))
repl = NamedSharding(mesh, P())
batch_sh = NamedSharding(mesh, P("data", None, None, None))
params = jax.device_put(params, repl)
opt_state = jax.device_put(opt_state, repl)
step = jax.jit(train.make_train_step(cfg),
               in_shardings=(repl, repl, batch_sh, None),
               out_shardings=(repl, repl, repl))

# each host contributes only ITS half of the global batch
images = datalib.synthetic_images(2, 64, 64, seed=7)
rng = np.random.default_rng(100 + pid)
local = datalib.random_crops(images, 32, 2, rng)
batch = jax.make_array_from_process_local_data(batch_sh, local)
params, opt_state, metrics = step(params, opt_state, batch, key)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
distributed.barrier("train-step-done", timeout_s=60.0)
print(f"TRAINOK {pid} {loss:.4f}", flush=True)
"""


def test_two_host_train_step():
    """Real 2-process data-parallel train step with per-host input slices."""
    coord = f"127.0.0.1:{_free_port()}"
    root = os.path.join(os.path.dirname(__file__), "..")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _TRAIN_WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=root, env=_env()) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        line = [ln for ln in out.splitlines() if ln.startswith("TRAINOK")][0]
        losses.append(line.split()[2])
    # replicated optimizer state -> both hosts report the identical loss
    assert losses[0] == losses[1], losses
