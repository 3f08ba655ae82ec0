"""init_multihost: real 2-process jax.distributed smoke on the CPU backend.

Two subprocesses join one coordination service, resolve a 2-process world,
and synchronize at a named cross-process barrier — the coordination path a
TPU pod takes per host (SURVEY §5.8). (Pooled global CPU *devices* would
additionally need gloo cpu-collectives, which this jaxlib build does not
expose — ICI collectives on real pods go through libtpu instead, so the
coordination layer is what is testable here.) Also pins the failure
semantics: auto-detection in a plain environment is a benign no-op, while
explicit coordinator settings that fail must raise (no silent single-host
fallback).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
from gan_tpu.parallel.mesh import init_multihost
n = init_multihost(coordinator_address={addr!r},
                   num_processes=2, process_id=int(sys.argv[1]))
assert n == 2, n
from jax._src import distributed
client = distributed.global_state.client
assert client is not None
# real cross-process synchronization: both processes must reach this point
client.wait_at_barrier("gan_tpu_smoke", 60_000)
print("OK", sys.argv[1])
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, addr=addr))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "GAN_TPU_PLATFORM")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK {i}" in out


def test_auto_detect_noop_returns_one():
    """In a plain single-host environment, auto-detection finds no cluster
    and init_multihost reports a 1-process world instead of raising."""
    from gan_tpu.parallel.mesh import init_multihost
    assert init_multihost() == 1
