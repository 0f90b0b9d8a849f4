"""Dedicated logger worker draining q_log.

Parity: reference `src/pipeline/logger.py:11-67` — millisecond timestamps,
independent console vs file verbosity, optional PROGRESS suppression in the
file handler (per-chunk rate logs can reach megabytes), GUI fan-out of
records at/above console verbosity.
"""

import logging
import time

from buzzdetect_tpu.loglevels import loglevels
from buzzdetect_tpu.runtime.assignments import AssignLog

logging.addLevelName(loglevels['PROGRESS'], 'PROGRESS')


class PeriodFormatter(logging.Formatter):
    def formatTime(self, record, datefmt=None):
        ct = self.converter(record.created)
        t = time.strftime('%Y-%m-%d %H:%M:%S', ct)
        return f'{t}.{int(record.msecs):03d}'


class FilterDropProgress(logging.Filter):
    def filter(self, record):
        return record.levelno != loglevels['PROGRESS']


class WorkerLogger:
    def __init__(self, path_log, coordinator, verbosity_print='PROGRESS',
                 verbosity_log='DEBUG', log_progress=False):
        self.coordinator = coordinator
        self.verbosity_print_int = loglevels[verbosity_print]

        self.log = logging.getLogger('buzzdetect_tpu')
        self.log.setLevel('DEBUG')
        self.log.handlers.clear()
        self.log.propagate = False

        fmt = PeriodFormatter('%(asctime)s [%(levelname)s] %(message)s')

        self.handle_file = logging.FileHandler(path_log)
        self.handle_file.setLevel(loglevels[verbosity_log])
        if not log_progress:
            self.handle_file.addFilter(FilterDropProgress())
        self.handle_file.setFormatter(fmt)
        self.log.addHandler(self.handle_file)

        self.handle_console = logging.StreamHandler()
        self.handle_console.setLevel(self.verbosity_print_int)
        self.handle_console.setFormatter(fmt)
        self.log.addHandler(self.handle_console)

    def __call__(self):
        self.run()

    def write_log(self, a_log: AssignLog):
        self.log.log(msg=a_log.message, level=a_log.level_int)
        if (self.coordinator.q_gui is not None
                and a_log.level_int >= self.verbosity_print_int):
            self.coordinator.q_gui.put(a_log)

    def run(self):
        a_log = self.coordinator.q_log.get()
        while not a_log.terminate:
            self.write_log(a_log)
            a_log = self.coordinator.q_log.get()
        self.write_log(AssignLog(message='logger closing', level_str='DEBUG'))
        self.handle_file.close()
        self.log.removeHandler(self.handle_file)
        self.log.removeHandler(self.handle_console)
