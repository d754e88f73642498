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
# every read crawls at 5-15 s without fully hanging.
FIRST_TIMEOUT_S = float(os.environ.get("POISMF_FETCH_TIMEOUT", "3"))
RETRY_TIMEOUT_S = 20.0
MAX_RETRIES = 4


def fetch_host(arr) -> np.ndarray:
    """``np.asarray(arr)`` with stalled-read retry (see module doc)."""
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
    for _ in range(MAX_RETRIES):
        threading.Thread(target=pull, daemon=True).start()
        if done.wait(RETRY_TIMEOUT_S):
            break
    done.wait()  # all retries in flight: block until ANY attempt lands
    v = out["v"]
    if isinstance(v, BaseException):
        raise v
    return v
