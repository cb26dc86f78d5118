"""Multi-host (DCN-analog) test: 2 real processes, 4 global devices.

SURVEY.md §5 plans multi-host via ``jax.distributed.initialize``;
``parallel/multihost.py`` wraps it.  This test proves the wrapper and
the cross-process collective path for real: it launches TWO separate
Python processes (2 virtual CPU devices each) that join one distributed
runtime through ``initialize_multihost``, computes the element-sharded
plate energy + gradients over the 4-device GLOBAL mesh (GSPMD inserts
cross-process collectives — the DCN analog on CPU is gloo), and asserts
both processes agree with the single-process value computed here.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

import hidenn_fem_tpu as ht

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_energy():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        if p.returncode != 0:
            if ("gloo" in err.lower() and "unavailable" in err.lower()) \
                    or "DISTRIBUTED_INIT" in err:
                pytest.skip(f"environment forbids multi-process CPU "
                            f"collectives: {err[-500:]}")
            pytest.fail(f"worker rc={p.returncode}:\n{err[-2000:]}")
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    # both processes saw the global topology and agree on the value
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["gnorm"] == results[1]["gnorm"]

    # single-process reference on this process's backend
    tri = ht.proxy_plate_mesh(nx=17, ny=9)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), tri)
    energy = ht.PlaneStressEnergy(model=model, E=10e9, nu=0.3)
    val, grads = jax.value_and_grad(lambda p: energy(p, tri))(params)
    gnorm = float(sum(float((g ** 2).sum())
                      for g in jax.tree.leaves(grads))) ** 0.5
    assert np.isclose(results[0]["loss"], float(val), rtol=1e-5)
    assert np.isclose(results[0]["gnorm"], gnorm, rtol=1e-4)
