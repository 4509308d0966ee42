"""Serving supervisor — replica restart at the serving layer.

SURVEY §5.3: the reference has no recovery story (its bench drivers stop
on nonzero child exit, bench_vllm_user_range.py:81-84, and engine-level
recovery is vLLM's); the survey's "new build" column calls for
health-check + replica restart at the serving layer.  This module is
that layer:

* **In-process faults** (a device error out of ``engine.step()``) are
  handled *inside* the server by ``LLMEngine.recover()`` — requests are
  requeued for recompute, nothing restarts (see
  ``entrypoints.openai_server.EngineWorker._loop``).
* **Process faults** (server crash, hang, OOM-kill, TPU runtime wedged)
  are handled *here*: the supervisor runs the OpenAI server as a child
  process, watches its exit status, polls ``/health``, and restarts the
  child with backoff when it dies or goes unresponsive.  In-flight
  requests on a crashed replica surface as dropped connections — clients
  retry against the fresh replica.

Usage::

    python -m vllm_triton_backend_tpu.entrypoints.supervisor \
        --port 8000 -- --model-dir /path/to/model

Everything after ``--`` is passed through to the server.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import urllib.error
import urllib.request


class Supervisor:
    """Restart-on-failure loop around one server child process.

    ``cmd`` is the child argv.  If ``health_url`` is set, the child must
    answer HTTP 200 within ``health_timeout`` seconds of each probe once
    its ``startup_grace`` has passed; ``health_fails`` consecutive missed
    probes count as a hang and trigger a kill + restart.
    """

    def __init__(
        self,
        cmd: list[str],
        health_url: str | None = None,
        poll_interval: float = 1.0,
        startup_grace: float = 30.0,
        health_timeout: float = 5.0,
        health_fails: int = 3,
        max_restarts: int = 10,
        backoff: float = 1.0,
        max_backoff: float = 30.0,
    ):
        self.cmd = cmd
        self.health_url = health_url
        self.poll_interval = poll_interval
        self.startup_grace = startup_grace
        self.health_timeout = health_timeout
        self.health_fails = health_fails
        self.max_restarts = max_restarts
        self.backoff = backoff
        self.max_backoff = max_backoff
        self.restarts = 0
        self._stop = False
        self._child: subprocess.Popen | None = None

    # -- probes ----------------------------------------------------------

    def _healthy(self) -> bool:
        assert self.health_url is not None
        try:
            with urllib.request.urlopen(
                self.health_url, timeout=self.health_timeout
            ) as resp:
                return resp.status == 200
        except (urllib.error.URLError, OSError, TimeoutError):
            return False

    # -- lifecycle --------------------------------------------------------

    def _spawn(self) -> subprocess.Popen:
        return subprocess.Popen(self.cmd)

    def _kill(self) -> None:
        child = self._child
        if child is None or child.poll() is not None:
            return
        child.terminate()
        try:
            child.wait(timeout=10)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()

    def stop(self) -> None:
        self._stop = True
        self._kill()

    def run(self) -> int:
        """Supervise until stopped or ``max_restarts`` is exhausted.
        Returns the child's final exit code."""
        rc = 0
        while not self._stop:
            self._child = self._spawn()
            started = time.monotonic()
            missed = 0
            # watch this incarnation
            while not self._stop:
                rc = self._child.poll()
                if rc is not None:
                    print(
                        f"[supervisor] child exited rc={rc}",
                        file=sys.stderr,
                    )
                    break
                if (
                    self.health_url is not None
                    and time.monotonic() - started > self.startup_grace
                ):
                    missed = 0 if self._healthy() else missed + 1
                    if missed >= self.health_fails:
                        print(
                            "[supervisor] health probe failed "
                            f"{missed}x; restarting",
                            file=sys.stderr,
                        )
                        self._kill()
                        rc = -1
                        break
                time.sleep(self.poll_interval)
            if self._stop:
                break
            if rc == 0:  # clean exit: do not resurrect
                return 0
            if self.restarts >= self.max_restarts:
                print(
                    "[supervisor] restart budget exhausted",
                    file=sys.stderr,
                )
                return rc if isinstance(rc, int) else 1
            delay = min(
                self.backoff * (2 ** self.restarts), self.max_backoff
            )
            self.restarts += 1
            print(
                f"[supervisor] restart #{self.restarts} in {delay:.1f}s",
                file=sys.stderr,
            )
            time.sleep(delay)
        self._kill()
        return rc if isinstance(rc, int) else 0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--startup-grace", type=float, default=120.0)
    ap.add_argument(
        "server_args", nargs=argparse.REMAINDER,
        help="args after -- go to entrypoints.openai_server",
    )
    args = ap.parse_args()
    passthrough = args.server_args
    if passthrough and passthrough[0] == "--":
        passthrough = passthrough[1:]
    cmd = [
        sys.executable, "-m",
        "vllm_triton_backend_tpu.entrypoints.openai_server",
        "--port", str(args.port), "--host", args.host,
        *passthrough,
    ]
    sup = Supervisor(
        cmd,
        health_url=f"http://{args.host}:{args.port}/health",
        max_restarts=args.max_restarts,
        startup_grace=args.startup_grace,
    )
    raise SystemExit(sup.run())


if __name__ == "__main__":
    main()
