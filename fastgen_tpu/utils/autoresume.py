"""Auto-resume interface (ref ``fastgen/utils/autoresume.py:39-141``).

Cluster preemption protocol: the trainer polls ``termination_requested`` on
host 0, saves ``latest``, calls ``request_resume`` and exits. The decision is
made identically on every host because all hosts poll the same signal source
(file-based by default) — no broadcast collective needed.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod


class AutoResumeInterface(ABC):
    @abstractmethod
    def init(self) -> None: ...

    @abstractmethod
    def get_resume_details(self) -> dict | None: ...

    @abstractmethod
    def termination_requested(self) -> bool: ...

    @abstractmethod
    def request_resume(self) -> None: ...


class NoOpAutoResume(AutoResumeInterface):
    def init(self) -> None:
        pass

    def get_resume_details(self):
        return None

    def termination_requested(self) -> bool:
        return False

    def request_resume(self) -> None:
        pass


class FileAutoResume(AutoResumeInterface):
    """Terminate when a sentinel file appears (works with any scheduler that
    can touch a file on the shared filesystem before preempting)."""

    def __init__(self, sentinel_path: str = ""):
        self.sentinel_path = sentinel_path or os.environ.get(
            "FASTGEN_TERMINATE_SENTINEL", "/tmp/fastgen_terminate")

    def init(self) -> None:
        # a sentinel left behind by a previous stop must not kill the new
        # run at iteration 1
        try:
            os.remove(self.sentinel_path)
        except FileNotFoundError:
            pass

    def get_resume_details(self):
        return None

    def termination_requested(self) -> bool:
        return os.path.exists(self.sentinel_path)

    def request_resume(self) -> None:
        try:
            os.remove(self.sentinel_path)
        except FileNotFoundError:
            pass
