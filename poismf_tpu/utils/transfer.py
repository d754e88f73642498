"""Device->host fetch with concurrent retry.

The tunneled-TPU transport intermittently loses a device->host read: the
request hangs for minutes (measured 107 s to >8 min) while the device is
idle and subsequent reads work fine.  Incidence clusters after hundreds of
MB of uploads through the same connection.  Since the data is READY on the
device and reads are side-effect free, the fix is to race a second request
against a stalled one and take whichever returns first — a lost request is
abandoned (daemon thread) rather than waited on.

On healthy transports (local TPUs, CPU) the first attempt returns in
microseconds and no thread is ever spawned beyond the first.
"""

from __future__ import annotations

import os
import threading
from typing import Any

import numpy as np

# First attempt gets this long before a retry is raced against it.  Healthy
# reads of the small arrays this guards land in well under a second even
# over the tunnel; 3 s also catches the transport's degraded mode where
# every read crawls at 5-15 s without fully hanging.  The retry windows
# escalate so that giving up (for callers that re-dispatch) only happens
# well past any legitimate compile-plus-execute duration the read may be
# waiting on — a lost READ resolves in the first retry; only a lost
# EXECUTION (nothing to read, ever) runs the schedule out.
FIRST_TIMEOUT_S = float(os.environ.get("POISMF_FETCH_TIMEOUT", "3"))
RETRY_TIMEOUTS_S = (20.0, 60.0, 90.0)


class FetchStalled(TimeoutError):
    """Every read attempt (1 + len(RETRY_TIMEOUTS_S)) is still in flight."""


def fetch_host(arr, give_up: bool = False) -> np.ndarray:
    """``np.asarray(arr)`` with stalled-read retry (see module doc).

    With ``give_up=True``, raises :class:`FetchStalled` once every attempt
    has been pending longer than its timeout — for callers that can
    re-dispatch the (pure) computation that produced ``arr`` instead of
    waiting out a lost EXECUTION rpc; the transport memoizes identical
    executions, so a re-dispatch of work that actually completed
    server-side returns almost instantly."""
    done = threading.Event()
    out: dict = {}

    def pull():
        try:
            v = np.asarray(arr)
        except BaseException as e:  # surface device errors, not hangs
            v = e
        if not done.is_set():
            out.setdefault("v", v)
            done.set()

    t = threading.Thread(target=pull, daemon=True)
    t.start()
    if done.wait(FIRST_TIMEOUT_S):
        v = out["v"]
        if isinstance(v, BaseException):
            raise v
        return v
    for w in RETRY_TIMEOUTS_S:
        threading.Thread(target=pull, daemon=True).start()
        if done.wait(w):
            break
    if not done.is_set() and give_up:
        raise FetchStalled(
            f"device->host read still pending after "
            f"{FIRST_TIMEOUT_S + sum(RETRY_TIMEOUTS_S):.0f}s "
            f"({1 + len(RETRY_TIMEOUTS_S)} attempts)"
        )
    done.wait()  # all retries in flight: block until ANY attempt lands
    v = out["v"]
    if isinstance(v, BaseException):
        raise v
    return v
