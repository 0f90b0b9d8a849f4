"""Run a user-supplied command on each live detection alert.

The last mile of field monitoring: ``analyze(watch=True,
alert_classes=...)`` already announces detections in the log the moment
scores land; ``alert_command=`` turns each announcement into an action —
an SMS gateway call, an MQTT publish, a speaker beep — without the
operator tailing a log. The reference has no notification hook at all
(its closest surface is reading result files after the run); this is a
deliberate superset shaped by the same need its watch-style deployments
describe.

Design rules (all about never hurting the analysis):

* The writer NEVER blocks on a notification. Alerts enqueue onto a small
  bounded queue drained by one daemon thread; when the queue is full
  (a slow command during an alert storm) new alerts are DROPPED and
  counted — the log line archive remains the complete record.
* Commands run through the shell (the command string is user-authored
  configuration, the same trust level as the CLI itself), but event data
  is passed ONLY via environment variables — class names and file idents
  never interpolate into shell syntax, so hostile filenames can't inject.
* One command at a time, killed after ``timeout_s``: a hung notifier
  degrades to dropped notifications, never to an unbounded process/thread
  pile (watch mode builds one runner per polling cycle — see
  tools/soak_watch.py's bounded-residue assertions).
* Failures warn ONCE per run and are counted; the summary lands in the
  log at close. An alert command that exits non-zero must not bury the
  DETECTED lines it exists to amplify.
"""

import os
import queue
import subprocess
import threading

# generous headroom for a notification hop (an HTTP POST, a mail relay);
# anything slower is effectively hung and gets killed so the queue drains
COMMAND_TIMEOUT_S = 30.0
QUEUE_DEPTH = 64


class AlertCommandRunner:
    """One per analysis run (owned by the writer worker)."""

    def __init__(self, command: str, log, depth: int = QUEUE_DEPTH,
                 timeout_s: float = COMMAND_TIMEOUT_S):
        self.command = command
        self.log = log  # callable(message, level_str) -> the run's log
        self.timeout_s = timeout_s
        self._q = queue.Queue(maxsize=depth)
        self._dropped = 0
        self._failures = 0
        self._warned = False
        self._launched = 0
        self._thread = threading.Thread(target=self._drain, daemon=True,
                                        name='alert-command')
        self._thread.start()

    def submit(self, fields: dict):
        """Enqueue one alert (non-blocking; drops when the queue is full)."""
        try:
            self._q.put_nowait(dict(fields))
        except queue.Full:
            self._dropped += 1

    def _drain(self):
        while True:
            fields = self._q.get()
            if fields is None:
                return
            env = dict(os.environ)
            env.update({f'BUZZ_{k.upper()}': str(v)
                        for k, v in fields.items()})
            self._launched += 1
            try:
                proc = subprocess.run(
                    self.command, shell=True, env=env,
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                    timeout=self.timeout_s)
                if proc.returncode != 0:
                    err = (proc.stderr or b'').decode(
                        errors='replace').strip()[-200:]
                    self._failure(f'exit {proc.returncode}'
                                  + (f': {err}' if err else ''))
            except subprocess.TimeoutExpired:
                self._failure(f'killed after {self.timeout_s:.0f}s timeout')
            except Exception as e:
                self._failure(str(e))

    def _failure(self, detail):
        self._failures += 1
        if not self._warned:
            self._warned = True
            self.log(f'alert command failed ({detail}); counting further '
                     f'failures silently — see the run summary', 'WARNING')

    def close(self, timeout: float = 5.0):
        """Stop accepting, drain briefly, and report drops/failures.

        Bounded: a command hung at close is abandoned to its own kill
        timeout on the daemon thread — shutdown never waits longer than
        ``timeout`` for notifications.
        """
        self._q.put(None)
        self._thread.join(timeout)
        if self._dropped:
            self.log(f'alert command: {self._dropped} alert(s) dropped '
                     f'(command slower than the alert rate; the DETECTED '
                     f'log lines remain complete)', 'WARNING')
        if self._failures:
            self.log(f'alert command: {self._failures} of '
                     f'{self._launched} invocation(s) failed', 'WARNING')
