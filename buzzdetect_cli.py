#!/usr/bin/env python
"""Drop-in CLI entry script (same role as the reference's buzzdetect_cli.py);
equivalent to the installed `buzzdetect` command."""

import multiprocessing

from buzzdetect_tpu.cli import main

if __name__ == '__main__':
    multiprocessing.freeze_support()
    multiprocessing.set_start_method('spawn', force=True)
    main()
