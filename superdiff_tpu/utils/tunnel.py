"""Fail-fast liveness probe for tunneled TPU runtimes.

On this image the chip is reached through a local TCP relay (the axon
plugin's PALLAS_AXON_POOL_IPS endpoints). When the relay is down the
plugin does not error — every backend attach hangs forever. Scripts that
are about to touch the chip call :func:`require_tunnel` first so a dead
relay produces an immediate, explicit failure instead of a silent
full-timeout hang (the round-3 outage burned hours this way).
"""

from __future__ import annotations

import os
import socket

# Port set served by the relay (see /root/.tpu_init.py on this image).
RELAY_PORTS = (8082, 8083, 8087, 8092, 8093, 8097,
               8102, 8103, 8107, 8112, 8113, 8117)


def _forced_cpu() -> bool:
    """True when the process already forced a CPU platform in-process —
    such runs never attach to the chip and must not be blocked."""
    try:
        import jax

        # jax_platforms is a priority list (e.g. 'axon,cpu' on this image):
        # only a leading 'cpu' means the process will not touch the chip.
        first = str(jax.config.jax_platforms or "").lower().split(",")[0]
        return first.strip() == "cpu"
    except Exception:
        return False


def tunnel_alive(timeout: float = 1.0) -> bool:
    """True when a relay endpoint accepts TCP, or when no relay is
    configured at all (non-tunneled runtimes must never be blocked)."""
    ips = [s for s in os.environ.get("PALLAS_AXON_POOL_IPS", "").split(",") if s]
    if not ips:
        return True
    for ip in ips:
        for port in RELAY_PORTS:
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            s.settimeout(timeout)
            try:
                s.connect((ip, port))
                return True
            except OSError:
                continue
            finally:
                s.close()
    return False


def require_tunnel(what: str = "this script") -> None:
    """Exit with a clear message when the chip is unreachable. No-op for
    CPU-forced processes and non-tunneled runtimes."""
    if _forced_cpu():
        return
    if not tunnel_alive():
        raise SystemExit(
            f"[tunnel] the TPU relay is not listening — {what} would hang "
            "forever on backend attach. Restore the tunnel (host-side) or "
            "force CPU in-process (jax.config.update('jax_platforms','cpu'))."
        )
