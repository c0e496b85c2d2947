"""Maintenance lease: one compact/vacuum runner per lake root.

Two concurrent maintain() runs (a cron'd job racing a manual one) would
interleave compact and vacuum and could delete each other's fresh
bases.  The lease is an O_EXCL lock file at the root; stale leases
(crashed holder) expire after ``stale_s``.

Steal-safety: stealing a stale lease via os.replace can race another
stealer — both replace() calls succeed, last writer wins.  So after
replacing, the stealer RE-READS the lock and only proceeds if it finds
its own nonce (the loser backs off).  Release is equally guarded: the
holder re-reads before unlinking, so a holder that overran the
staleness window never releases a lock a newer runner now owns.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid


@contextlib.contextmanager
def maintenance_lease(root: str, name: str = "_maintenance.lock",
                      stale_s: float = 3600.0):
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    nonce = uuid.uuid4().hex
    token = {"pid": os.getpid(), "nonce": nonce, "at": time.time()}
    tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(token, f)

    def _holder() -> dict:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    acquired = False
    tmp_live = True
    try:
        try:
            os.link(tmp, path)  # O_EXCL: clean acquisition
            acquired = True
        except FileExistsError:
            holder = _holder()
            if time.time() - holder.get("at", 0) < stale_s:
                raise RuntimeError(
                    f"maintenance already running (pid {holder.get('pid')}); "
                    f"stale leases expire after {stale_s / 3600:.1f}h"
                )
            os.replace(tmp, path)  # steal the stale lease
            tmp_live = False
            # confirm the steal: a racing stealer may have replaced after
            # us — only the nonce the file actually holds won
            if _holder().get("nonce") != nonce:
                raise RuntimeError(
                    "maintenance lease steal lost to a concurrent runner"
                )
            acquired = True
        yield
    finally:
        if tmp_live and os.path.exists(tmp):
            os.unlink(tmp)
        # release only a lock that is still OURS: an overrun holder
        # (past stale_s) may have been legitimately stolen from — its
        # unlink would free the thief's lock for a third runner
        if acquired and _holder().get("nonce") == nonce:
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
