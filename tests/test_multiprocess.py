"""Multi-process distributed validation (SURVEY.md §4: "a multi-host
simulation layer"; VERDICT.md round-1 item #3).

Launches 2 and 4 REAL OS processes, each with 2 virtual CPU devices,
joined by jax.distributed (gloo collectives) through
cornetto_tpu.dist.multihost.initialize — the exact code path a pod slice
uses — and runs the sharded decision step + sp window scan across the
process boundary (tests/_mp_worker.py).  This fails if multihost init or
any cross-process collective breaks.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # slow: two real gloo process groups, minutes of wall

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_mp_worker.py")
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("num_procs", [2, 4])
def test_multiprocess_distributed(num_procs):
    coordinator = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(num_procs), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO)
        for i in range(num_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            "worker %d failed:\n%s" % (i, out[-4000:]))
        assert "OK" in out
