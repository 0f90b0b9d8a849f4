#!/usr/bin/env python
"""Drop-in GUI entry script (same role as the reference's buzzdetect_gui.py);
equivalent to `python -m buzzdetect_tpu.gui`."""

from buzzdetect_tpu.gui import analyze_gui

if __name__ == '__main__':
    analyze_gui()
