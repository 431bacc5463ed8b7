"""HTTP trigger surface — the reference's REST entry point
(``controller/ReconciliationController.java:35-52``: ``GET /execute``
launches the reconciliation job and answers "job started"; a cron
schedule is stubbed in comments) re-expressed over the Ray engine with
only the stdlib.

Design choices mirroring the reference:
- ``GET /execute`` starts the configured job in a background thread and
  returns immediately (202 + run id) — the launcher, not the job, owns
  the request lifetime.
- single-flight: a second ``/execute`` while one run is active answers
  409 (the Spring Batch ``JobExecutionAlreadyRunningException``
  analogue) instead of stacking concurrent runs on one lake.
- ``GET /status`` reports the last/active run's state and metrics
  (Spring Batch exposes this through its job repository; here it's a
  JSON view of the same bookkeeping).

The server NEVER calls ``ray.init`` — the process that starts it owns
the Ray session (driver contract). The job callable is arbitrary; the
CLI wires the same replay+reconcile pipeline ``run.py`` executes.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class TriggerServer:
    """Minimal single-flight job trigger. ``job`` is a zero-arg
    callable returning a JSON-serializable dict (its metrics).

    ``every`` (seconds) additionally runs the job on a fixed interval —
    the reference's disabled cron schedule (``@EnableScheduling``,
    ``config/SchedulerConfig.java:6-9``; commented ``@Scheduled`` on the
    same ``reconcile()``, ``ReconciliationController.java:41-42``) made
    live: each tick goes through the SAME single-flight ``_launch`` as
    ``/execute``, so a tick that overlaps an active run (scheduled or
    manual) is SKIPPED, never stacked — the skip count is reported in
    ``/status`` as ``skipped_ticks``."""

    def __init__(
        self, job, host: str = "127.0.0.1", port: int = 0,
        every: float | None = None,
    ):
        if every is not None and not every > 0:
            # Event.wait(0) returns immediately: a non-positive interval
            # would busy-spin the cron thread against the launch lock
            raise ValueError(f"every must be a positive interval, got {every!r}")
        self._job = job
        self._lock = threading.Lock()
        self._state: dict = {"state": "idle"}
        self._every = every
        self._ticker_stop = threading.Event()
        self._skipped_ticks = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: the engine logs, not http
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, sort_keys=True).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/execute":
                    started, info = outer._launch()
                    self._reply(202 if started else 409, info)
                elif self.path == "/status":
                    self._reply(200, outer.status())
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="trigger-http", daemon=True
        )

    # -- lifecycle -------------------------------------------------------
    def start(self) -> tuple[str, int]:
        self._thread.start()
        if self._every is not None:
            threading.Thread(
                target=self._tick_loop, name="trigger-cron", daemon=True
            ).start()
        return self._httpd.server_address[:2]

    def stop(self) -> None:
        self._ticker_stop.set()
        self._httpd.shutdown()
        self._httpd.server_close()

    def _tick_loop(self) -> None:
        # wait-first cadence: the serve start isn't itself a tick (the
        # reference's cron fires on schedule, not at boot)
        while not self._ticker_stop.wait(self._every):
            started, _ = self._launch()
            if not started:
                with self._lock:
                    self._skipped_ticks += 1

    # -- job bookkeeping ---------------------------------------------------
    def _launch(self) -> tuple[bool, dict]:
        with self._lock:
            if self._state.get("state") == "running":
                return False, {
                    "error": "a run is already active",  # 409: single-flight
                    "run_id": self._state["run_id"],
                }
            run_id = str(uuid.uuid4())
            self._state = {"state": "running", "run_id": run_id,
                           "started_at": time.time()}
        threading.Thread(
            target=self._run, args=(run_id,), name=f"trigger-job-{run_id[:8]}",
            daemon=True,
        ).start()
        return True, {"status": "JOB_STARTED", "run_id": run_id}

    def _run(self, run_id: str) -> None:
        try:
            metrics = self._job()
            done = {"state": "done", "metrics": metrics}
        except Exception as e:  # surfaced via /status, never swallowed
            done = {"state": "failed", "error": f"{type(e).__name__}: {e}"}
        with self._lock:
            self._state = {
                "run_id": run_id,
                "finished_at": time.time(),
                **done,
            }

    def status(self) -> dict:
        with self._lock:
            st = dict(self._state)
            if self._every is not None:
                st["every"] = self._every
                st["skipped_ticks"] = self._skipped_ticks
            return st
