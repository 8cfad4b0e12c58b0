"""Shared producer-thread plumbing for host-side prefetch loops.

Both the BatchLoader (data/dataset.py) and the sequence-eval lookahead
(engine/seq_eval.py) run a daemon producer feeding a bounded queue; an
abandoned consumer (exception, early break) must release that thread and
whatever it holds instead of pinning it on a full queue forever.
"""

from __future__ import annotations

import queue
import threading


def stop_aware_put(q: "queue.Queue", item, stop: threading.Event,
                   poll: float = 0.1) -> bool:
    """Bounded put that aborts when `stop` is set (the consumer went away).
    Returns False if aborted, True once the item is enqueued."""
    while not stop.is_set():
        try:
            q.put(item, timeout=poll)
            return True
        except queue.Full:
            continue
    return False
