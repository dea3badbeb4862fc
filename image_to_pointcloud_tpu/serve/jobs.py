"""Job registry: the reference's in-memory dict, done safely.

Reference semantics (backend/app.py:40, 642-647; backend/main.py:47):
UUID job ids, states pending → processing → completed | error, integer
progress 0-100, a human message, results attached on completion. The
reference mutates a bare module dict from background tasks (benign only
under the GIL, SURVEY.md §5); here a single-writer registry guards all
mutation with an asyncio lock and supports the v2 list/delete surface.
"""

from __future__ import annotations

import asyncio
import datetime
import uuid
from dataclasses import dataclass, field
from typing import Any

__all__ = ["JobStatus", "Job", "JobRegistry"]


class JobStatus:
    PENDING = "pending"
    PROCESSING = "processing"
    COMPLETED = "completed"
    ERROR = "error"


@dataclass
class Job:
    job_id: str
    status: str = JobStatus.PENDING
    progress: int = 0
    message: str = "Job queued"
    results: Any = None
    created_at: str = ""
    model: str = ""
    extra: dict = field(default_factory=dict)

    def to_v1(self) -> dict:
        return {
            "job_id": self.job_id,
            "status": self.status,
            "progress": self.progress,
            "message": self.message,
            "results": self.results,
        }

    def to_v2(self) -> dict:
        out = {
            "job_id": self.job_id,
            "status": self.status,
            "progress": self.progress,
            "message": self.message,
            "created_at": self.created_at,
            "model": self.model,
        }
        if self.status == JobStatus.COMPLETED and self.results:
            out["results"] = self.results
        return out


class JobRegistry:
    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}
        self._lock = asyncio.Lock()

    async def create(self, *, message: str = "Job queued", model: str = "") -> Job:
        job = Job(
            job_id=str(uuid.uuid4()),
            message=message,
            model=model,
            created_at=datetime.datetime.now().isoformat(),
        )
        async with self._lock:
            self._jobs[job.job_id] = job
        return job

    async def update(
        self,
        job_id: str,
        *,
        status: str | None = None,
        progress: int | None = None,
        message: str | None = None,
        results: Any = None,
    ) -> None:
        async with self._lock:
            job = self._jobs[job_id]
            if status is not None:
                job.status = status
            if progress is not None:
                job.progress = progress
            if message is not None:
                job.message = message
            if results is not None:
                job.results = results

    def get(self, job_id: str) -> Job | None:
        return self._jobs.get(job_id)

    def __contains__(self, job_id: str) -> bool:
        return job_id in self._jobs

    def __len__(self) -> int:
        return len(self._jobs)

    async def delete(self, job_id: str) -> bool:
        async with self._lock:
            return self._jobs.pop(job_id, None) is not None

    def list(self, status: str | None = None) -> list[Job]:
        return [
            j for j in self._jobs.values() if status is None or j.status == status
        ]
