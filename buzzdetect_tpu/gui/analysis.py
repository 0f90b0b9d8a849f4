"""Analysis window: runs an analysis in a child process, streams its log
records into a colored textbox, and offers stop/rerun.

Parity: reference `src/gui/analysis.py:12-242` — the analysis runs in a
``multiprocessing.Process`` (the only process boundary in the system) so the
GUI stays responsive and a stop can always be delivered; log records arrive
over ``q_gui`` and are drained every POLL_INTERVAL_MS.
"""

import multiprocessing
import queue as queue_mod
import tkinter as tk
from tkinter import messagebox, ttk

from buzzdetect_tpu.gui import config as gui_cfg


def run_analysis(kwargs, q_gui, event_stop):
    """Child-process entry point: run analyze() with GUI hooks attached."""
    from buzzdetect_tpu.analysis import analyze
    analyze(q_gui=q_gui, event_stopanalysis=event_stop, **kwargs)


class AnalysisWindow(tk.Toplevel):
    def __init__(self, parent, analyze_kwargs):
        super().__init__(parent)
        self.title('buzzdetect — analysis')
        self.geometry('900x520')
        self.analyze_kwargs = analyze_kwargs

        self.textbox = tk.Text(self, bg='#1a1a1a', state='disabled',
                               wrap='word')
        self.textbox.pack(fill='both', expand=True, padx=8, pady=8)
        for level, color in gui_cfg.LEVEL_COLORS.items():
            self.textbox.tag_configure(level, foreground=color)

        bar = ttk.Frame(self)
        bar.pack(fill='x', padx=8, pady=(0, 8))
        self.btn_stop = ttk.Button(bar, text='Stop analysis',
                                   command=self.stop_analysis)
        self.btn_stop.pack(side='left')
        self.btn_rerun = ttk.Button(bar, text='Rerun', state='disabled',
                                    command=self.launch_analysis)
        self.btn_rerun.pack(side='left', padx=8)

        self.process = None
        self.q_gui = None
        self.event_stop = None
        self.launch_analysis()

    # --- process lifecycle ---------------------------------------------------
    def launch_analysis(self):
        ctx = multiprocessing.get_context('spawn')
        self.q_gui = ctx.Queue()
        self.event_stop = ctx.Event()
        self.process = ctx.Process(
            target=run_analysis,
            args=(self.analyze_kwargs, self.q_gui, self.event_stop),
            daemon=True)
        self.process.start()
        self.btn_stop.configure(state='normal')
        self.btn_rerun.configure(state='disabled')
        self.after(gui_cfg.POLL_INTERVAL_MS, self.poll_queue)

    def stop_analysis(self):
        if self.process is None or not self.process.is_alive():
            return
        if messagebox.askyesno('Stop analysis',
                               'Stop the running analysis? Finished chunks '
                               'are saved and the run can be resumed later.'):
            self.event_stop.set()

    # --- log streaming ----------------------------------------------------------
    def poll_queue(self):
        try:
            while True:
                a_log = self.q_gui.get_nowait()
                self._append(a_log)
        except queue_mod.Empty:
            pass
        if self.process is not None and self.process.is_alive():
            self.after(gui_cfg.POLL_INTERVAL_MS, self.poll_queue)
        else:
            self.btn_stop.configure(state='disabled')
            self.btn_rerun.configure(state='normal')

    def _append(self, a_log):
        self.textbox.configure(state='normal')
        self.textbox.insert('end', a_log.message + '\n', a_log.level_str)
        self.textbox.see('end')
        self.textbox.configure(state='disabled')
