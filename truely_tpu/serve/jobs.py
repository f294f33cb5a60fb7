"""Async analysis jobs.

The reference's ``/analyze-*`` handlers block the HTTP request for the whole
analysis (minutes on its CPU path — SURVEY.md §2.3 even notes it stalls the
event loop).  The synchronous endpoints are kept for contract parity; this
adds an additive async surface:

    POST /jobs/analyze-video    {videoPath}            -> {jobId}
    POST /jobs/analyze-combined {videoPath, audioPath} -> {jobId}
    GET  /jobs/{job_id}         -> {status, ...result when done}

Jobs run on a single worker thread (the device is serialized anyway) and
results land in the same TTL store the synchronous path uses, so /view,
/video, /audio work identically on completed jobs.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

logger = logging.getLogger(__name__)


@dataclass
class Job:
    job_id: str
    kind: str
    status: str = "queued"        # queued | running | done | failed
    created_at: float = field(default_factory=time.time)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None

    def to_json(self) -> Dict[str, Any]:
        payload: Dict[str, Any] = {
            "jobId": self.job_id,
            "kind": self.kind,
            "status": self.status,
            "createdAt": self.created_at,
        }
        if self.started_at is not None:
            payload["startedAt"] = self.started_at
        if self.finished_at is not None:
            payload["finishedAt"] = self.finished_at
        if self.status == "done" and self.result is not None:
            payload.update(self.result)
        if self.status == "failed":
            payload["error"] = self.error
        return payload


class JobRunner:
    """Single-worker job queue (device access is serialized regardless)."""

    def __init__(self, ttl_seconds: float = 3600.0):
        self._jobs: Dict[str, Job] = {}
        self._lock = threading.Lock()
        self._queue: "queue.Queue[Optional[str]]" = queue.Queue()
        self._fns: Dict[str, Callable[[], Dict[str, Any]]] = {}
        self._ttl = ttl_seconds
        self._worker: Optional[threading.Thread] = None

    def _ensure_worker(self) -> None:
        # Under the lock: two concurrent submits could otherwise both see a
        # missing worker and start two, breaking the single-worker queue
        # contract (device serialization would still hold downstream).
        with self._lock:
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(
                    target=self._loop, daemon=True
                )
                self._worker.start()

    def submit(self, kind: str, fn: Callable[[], Dict[str, Any]]) -> Job:
        job = Job(job_id=str(uuid.uuid4()), kind=kind)
        with self._lock:
            self._jobs[job.job_id] = job
            self._fns[job.job_id] = fn
        self._queue.put(job.job_id)
        self._ensure_worker()
        return job

    def get(self, job_id: str) -> Optional[Job]:
        with self._lock:
            self._sweep_locked()
            return self._jobs.get(job_id)

    def _sweep_locked(self) -> None:
        now = time.time()
        dead = [
            jid for jid, j in self._jobs.items()
            if j.finished_at and now - j.finished_at > self._ttl
        ]
        for jid in dead:
            self._jobs.pop(jid, None)
            self._fns.pop(jid, None)

    def _loop(self) -> None:
        while True:
            job_id = self._queue.get()
            if job_id is None:
                return
            with self._lock:
                job = self._jobs.get(job_id)
                fn = self._fns.pop(job_id, None)
            if job is None or fn is None:
                continue
            job.status = "running"
            job.started_at = time.time()
            try:
                job.result = fn()
                job.status = "done"
            except Exception as e:
                logger.exception("job %s failed", job_id)
                job.error = str(e)
                job.status = "failed"
            finally:
                job.finished_at = time.time()

    def wait(self, job_id: str, timeout: float = 60.0) -> Optional[Job]:
        """Test helper: poll until the job leaves queued/running."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = self.get(job_id)
            if job is None or job.status in ("done", "failed"):
                return job
            time.sleep(0.02)
        return self.get(job_id)
