"""Pipeline-stage orchestration: the local/cloud job queue.

The reference wires pipeline stages together with AWS S3 events, Lambda
fan-out and Batch submit_job calls (msf_flow/deployment/README.md:1-27;
trigger scripts compute-ime/invoke-ime, workflow/trigger-msf-flow.py,
spectrometer-masks/trigger-spectroscopy-masks.py). The equivalent here is
a small event-driven work queue:

- ``JobQueue`` registers handlers per job type and executes submitted
  jobs (synchronously or on a thread pool) — the Lambda/Batch analog;
- ``watch_and_trigger`` turns new files in a directory into jobs — the
  S3-event analog (DirWatcher supplies the "event stream"; pair with
  ``flow.objectstore`` for the S3 wire protocol itself);
- ``load_job_specs``/``register_job_specs`` wire a declarative job map
  (``deployment/jobs.json`` — the Batch job definitions + invoke-script
  parameter dicts) onto the queue as CLI handlers.

Job parameter conventions follow the reference's Batch parameters
(deployment/compute-ime/invoke-ime:21-33: CMF_DIR, PPMMTHR=1500,
FETCHMAX=150, MERGEDISTS="10 20 50", MINAREA=9).
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import threading
from dataclasses import dataclass, field
from typing import Callable

from .utils import DirWatcher

__all__ = ["Job", "JobQueue", "watch_and_trigger", "IME_JOB_DEFAULTS",
           "load_job_specs", "render_command", "make_cli_handler",
           "register_job_specs"]

#: reference Batch parameters for the compute-ime job
#: (deployment/compute-ime/invoke-ime:21-33)
IME_JOB_DEFAULTS = {
    "PPMMTHR": 1500,
    "FETCHMAX": 150,
    "MERGEDISTS": "10 20 50",
    "MINAREA": 9,
}


@dataclass
class Job:
    job_type: str
    params: dict = field(default_factory=dict)


class JobQueue:
    """Register handlers per job type; submit jobs; run them inline or on
    worker threads. Results and failures are retained for inspection
    (the reference's only failure handling is keep-going + logs)."""

    def __init__(self, workers: int = 0):
        self._handlers: dict[str, Callable[[dict], object]] = {}
        self._results: list = []
        self._failures: list = []
        self._q: "queue.Queue[Job]" = queue.Queue()
        self._workers = workers
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        if workers > 0:
            for _ in range(workers):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)

    def register(self, job_type: str, handler: Callable[[dict], object]):
        self._handlers[job_type] = handler

    def submit(self, job: Job):
        if job.job_type not in self._handlers:
            raise KeyError(f"no handler for job type {job.job_type!r}")
        if self._workers > 0:
            self._q.put(job)
        else:
            self._run(job)

    def _run(self, job: Job):
        try:
            self._results.append((job, self._handlers[job.job_type](
                job.params)))
        except Exception as e:  # keep-going semantics
            self._failures.append((job, e))

    def _worker(self):
        while not self._stop.is_set():
            try:
                job = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            self._run(job)
            self._q.task_done()

    def join(self):
        if self._workers > 0:
            self._q.join()

    def shutdown(self):
        self._stop.set()

    @property
    def results(self):
        return list(self._results)

    @property
    def failures(self):
        return list(self._failures)


def load_job_specs(path: str) -> dict:
    """Load a job-definition map (``deployment/jobs.json``): job name ->
    {command: [argv template], defaults: {PARAM: value}, trigger:
    {regex, param}}. This is the declarative equivalent of the
    reference's Batch job definitions + invoke scripts (the parameter
    dicts in deployment/compute-ime/invoke-ime:21-33 and
    workflow/trigger-msf-flow.py:1-30)."""
    with open(path) as f:
        specs = json.load(f)
    for name, spec in specs.items():
        if "command" not in spec:
            raise ValueError(f"job {name!r} has no command template")
    return specs


def render_command(spec: dict, params: dict) -> list[str]:
    """Render a job's argv from its template: ``{PARAM}`` placeholders are
    substituted from ``params`` merged over the spec's defaults (Batch
    `parameters` semantics — submit-time values override the job
    definition's defaults)."""
    merged = {**spec.get("defaults", {}), **params}
    return [str(a).format(**merged) for a in spec["command"]]


def make_cli_handler(spec: dict, runner: Callable | None = None):
    """Handler that executes a job spec's CLI command — the Batch
    container-run analog. ``runner`` (default subprocess.run with
    check=True) is injectable for schedulers and tests."""
    runner = runner or (lambda argv: subprocess.run(argv, check=True))

    def handler(params: dict):
        return runner(render_command(spec, params))

    return handler


def register_job_specs(jobq: JobQueue, specs: dict,
                       runner: Callable | None = None):
    """Register every job in a spec map on a queue (the deployment's
    job<->source wiring, reference deployment/README.md:3-27)."""
    for name, spec in specs.items():
        jobq.register(name, make_cli_handler(spec, runner))


def watch_and_trigger(watch_dir: str, job_type: str, jobq: JobQueue,
                      regex: str = ".*", force: bool = False,
                      param_key: str = "path"):
    """One watch cycle: new files matching ``regex`` become jobs — the
    S3-event -> Lambda trigger analog. Returns the submitted jobs."""
    watcher = DirWatcher(watch_dir, force=force, regex=regex)
    jobs = []
    for path in watcher.whats_new_local():
        job = Job(job_type, {param_key: path})
        jobq.submit(job)
        jobs.append(job)
    return jobs
