"""Consumer-state persistence SPI (SURVEY §2.10 O6).

The reference persists each virtual spout's ``ConsumerState`` — the
per-partition last-finished-offset map — through a pluggable
``PersistenceAdapter`` (``persistence/PersistenceAdapter.java:33-69``)
with ZooKeeper (``persistence/ZookeeperPersistenceAdapter.java:44-199``,
paths ``zkRoot/consumers/{id}/{partition}``) and in-memory
(``persistence/InMemoryPersistenceAdapter.java``) implementations.

In this engine the *source of truth* for restart offsets is the
Structured Streaming checkpoint (T1/T2: the micro-batch is the atomic
commit unit).  This SPI is the checkpoint's operational mirror — the
queryable control table the reference's monitor reads
(``SpoutPartitionProgressMonitor.java:40-209``): per-route delivered
high-water marks, flushed on the ``coordinator.state_flush_interval_ms``
cadence, swappable for a remote store (a ZK/Redis/DB adapter implements
the same four methods) exactly like the sideline persistence seam (O7).
"""

from __future__ import annotations

import json
import os
from typing import Protocol


class ConsumerStatePersistence(Protocol):
    """The O6 adapter surface: CRUD of ``route_id -> {partition: offset}``
    (``PersistenceAdapter.java:33-69`` — persistConsumerState /
    retrieveConsumerState / clearConsumerState + listing)."""

    def persist_state(self, route_id: str, offsets: dict[int, int]) -> None: ...

    def retrieve_state(self, route_id: str) -> dict[int, int] | None: ...

    def delete_state(self, route_id: str) -> None: ...

    def list_routes(self) -> list[str]: ...


class InMemoryConsumerStatePersistence:
    """InMemoryPersistenceAdapter analogue — embedded/testing."""

    def __init__(self) -> None:
        self._store: dict[str, dict[int, int]] = {}

    def persist_state(self, route_id: str, offsets: dict[int, int]) -> None:
        self._store[route_id] = {int(p): int(o) for p, o in offsets.items()}

    def retrieve_state(self, route_id: str) -> dict[int, int] | None:
        state = self._store.get(route_id)
        return dict(state) if state is not None else None

    def delete_state(self, route_id: str) -> None:
        self._store.pop(route_id, None)

    def list_routes(self) -> list[str]:
        return sorted(self._store)


class FileConsumerStatePersistence:
    """One JSON file per route under ``state_dir`` — the file-backed
    stand-in for the reference's ``zkRoot/consumers/{id}`` subtree
    (``ZookeeperPersistenceAdapter.java:179-181``).  Writes are
    tmp+rename so a concurrent reader never sees a torn file."""

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, route_id: str) -> str:
        return os.path.join(self.state_dir, f"{route_id}.json")

    def persist_state(self, route_id: str, offsets: dict[int, int]) -> None:
        tmp = self._path(route_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(p): int(o) for p, o in offsets.items()}, fh, sort_keys=True)
        os.replace(tmp, self._path(route_id))

    def retrieve_state(self, route_id: str) -> dict[int, int] | None:
        path = self._path(route_id)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return {int(p): int(o) for p, o in json.load(fh).items()}

    def delete_state(self, route_id: str) -> None:
        try:
            os.remove(self._path(route_id))
        except FileNotFoundError:
            pass

    def list_routes(self) -> list[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.state_dir)
            if f.endswith(".json")
        )
