"""Telemetry events for index lifecycle and planner usage.

Reference: telemetry/HyperspaceEvent.scala + EventLogger — every action
emits a typed event (index name, operation, state transition, duration)
through a pluggable logger.  Here the emitter is a plain handler list:
the default handler writes structured lines through `logging`; register
your own with `on_event` to ship them anywhere (Spark listener bus,
metrics agent, a Kafka topic).  Handlers must never break the engine —
exceptions are swallowed per the reference's fire-and-forget contract.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable

log = logging.getLogger("hyperspace_spark.telemetry")


@dataclass
class HyperspaceEvent:
    kind: str  # create | refresh | optimize | delete | restore | vacuum | cancel | apply
    index_name: str = ""
    detail: str = ""
    duration_ms: int = 0
    success: bool = True
    timestamp_ms: int = field(default_factory=lambda: int(time.time() * 1000))


_HANDLERS: list[Callable[[HyperspaceEvent], None]] = []


def on_event(handler: Callable[[HyperspaceEvent], None]) -> None:
    """Register a handler; returns nothing.  Remove with off_event."""
    _HANDLERS.append(handler)


def off_event(handler: Callable[[HyperspaceEvent], None]) -> None:
    try:
        _HANDLERS.remove(handler)
    except ValueError:
        pass


def emit(event: HyperspaceEvent) -> None:
    log.info(
        "event kind=%s index=%s success=%s duration_ms=%d %s",
        event.kind,
        event.index_name,
        event.success,
        event.duration_ms,
        event.detail,
    )
    for h in list(_HANDLERS):
        try:
            h(event)
        except Exception:  # fire-and-forget: telemetry never breaks the engine
            log.debug("telemetry handler failed", exc_info=True)


class timed_event:
    """Context manager: emits one event when the block exits, with
    duration and success flag."""

    def __init__(self, kind: str, index_name: str = "", detail: str = ""):
        self.ev = HyperspaceEvent(kind=kind, index_name=index_name, detail=detail)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self.ev

    def __exit__(self, exc_type, exc, tb):
        self.ev.duration_ms = int((time.perf_counter() - self._t0) * 1000)
        self.ev.success = exc_type is None
        emit(self.ev)
        return False
