"""Headless Tk stand-in for driving the GUI toolkit layer without a display.

This environment has no X server and no Xvfb, so `tk.Tk()` cannot start —
but the window/widget logic (gui/settings.py, gui/analysis.py,
gui/widgets.py) is exactly the code a headless CI can't otherwise reach.
The stub implements the slice of the tkinter/ttk surface those modules use,
with real semantics where behavior matters:

* Variables fire their ``write`` traces on set() — including programmatic
  sets, which is the re-entrancy the settings window's ``_syncing`` guard
  exists for;
* ``after`` schedules callbacks into a pump the test drains manually, so
  the analysis window's queue-polling loop runs for real;
* Buttons/Checkbuttons support ``invoke()`` honoring the disabled state.

Install with :func:`install` BEFORE importing the gui modules (they bind
``tkinter`` at import time), and restore with :func:`uninstall`.
"""

import itertools
import sys
import types

_ids = itertools.count(1)


class _Scheduler:
    def __init__(self):
        self.pending = {}

    def add(self, fn):
        handle = f'after#{next(_ids)}'
        self.pending[handle] = fn
        return handle

    def cancel(self, handle):
        self.pending.pop(handle, None)

    def pump(self):
        """Fire everything currently scheduled (not what they reschedule)."""
        batch = list(self.pending.items())
        self.pending.clear()
        for _, fn in batch:
            fn()
        return len(batch)


SCHEDULER = _Scheduler()


class Variable:
    _default = ''

    def __init__(self, value=None, **_kw):
        self._value = self._default if value is None else value
        self._traces = []

    def get(self):
        return self._value

    def set(self, value):
        self._value = value
        for cb in self._traces:   # tkinter fires even on unchanged values
            cb('name', '', 'write')

    def trace_add(self, mode, cb):
        assert mode == 'write'
        self._traces.append(cb)
        return f'trace#{next(_ids)}'


class StringVar(Variable):
    _default = ''

    def set(self, value):
        super().set('' if value is None else str(value))


class BooleanVar(Variable):
    _default = False

    def set(self, value):
        super().set(bool(value))


class Widget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.kw = dict(kw)
        self.children = []
        self.packed = False
        self.destroyed = False
        if master is not None and hasattr(master, 'children'):
            master.children.append(self)

    # geometry managers: record only
    def pack(self, **_kw):
        self.packed = True

    def pack_forget(self):
        self.packed = False

    def grid(self, **_kw):
        self.packed = True

    def configure(self, **kw):
        self.kw.update(kw)

    config = configure

    def cget(self, key):
        return self.kw.get(key)

    def __getitem__(self, key):
        return self.kw.get(key)

    def destroy(self):
        self.destroyed = True
        for c in self.children:
            c.destroy()

    # scheduling / window protocol (used by Tk/Toplevel but harmless here)
    def after(self, _ms, fn=None):
        return SCHEDULER.add(fn)

    def after_cancel(self, handle):
        SCHEDULER.cancel(handle)

    def title(self, *_a):
        pass

    def geometry(self, *_a):
        pass

    def protocol(self, name, fn):
        self.kw[f'protocol:{name}'] = fn

    def bell(self):
        pass

    def winfo_exists(self):
        return not self.destroyed


class Tk(Widget):
    pass


class Toplevel(Widget):
    pass


class Frame(Widget):
    pass


class Label(Widget):
    pass


class Text(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.lines = []          # (text, tag)
        self.tags = {}

    def tag_configure(self, tag, **kw):
        self.tags[tag] = kw

    def insert(self, _index, text, tag=None):
        self.lines.append((text, tag))

    def see(self, _index):
        pass

    def get_text(self):
        return ''.join(t for t, _ in self.lines)


class Entry(Widget):
    pass


class Button(Widget):
    def invoke(self):
        if self.kw.get('state') != 'disabled' and self.kw.get('command'):
            return self.kw['command']()


class Checkbutton(Widget):
    def invoke(self):
        if self.kw.get('state') == 'disabled':
            return
        var = self.kw.get('variable')
        if var is not None:
            var.set(not var.get())
        if self.kw.get('command'):
            return self.kw['command']()


class Combobox(Widget):
    pass


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def build_modules():
    tk = _module(
        'tkinter', Tk=Tk, Toplevel=Toplevel, Frame=Frame, Label=Label,
        Text=Text, StringVar=StringVar, BooleanVar=BooleanVar,
        Variable=Variable, TclError=RuntimeError, END='end')
    ttk = _module('tkinter.ttk', Frame=Frame, Label=Label, Entry=Entry,
                  Button=Button, Checkbutton=Checkbutton, Combobox=Combobox)
    messagebox = _module('tkinter.messagebox',
                         askyesno=lambda *a, **k: True,
                         showerror=lambda *a, **k: None)
    filedialog = _module('tkinter.filedialog',
                         askdirectory=lambda *a, **k: '')
    tk.ttk = ttk
    tk.messagebox = messagebox
    tk.filedialog = filedialog
    return {'tkinter': tk, 'tkinter.ttk': ttk,
            'tkinter.messagebox': messagebox,
            'tkinter.filedialog': filedialog}


GUI_MODULES = ('buzzdetect_tpu.gui.settings', 'buzzdetect_tpu.gui.analysis',
               'buzzdetect_tpu.gui.widgets', 'buzzdetect_tpu.gui.splash')


def install():
    """Swap in the stub and drop cached gui modules so they rebind."""
    saved = {}
    for name in list(build_modules()) + list(GUI_MODULES):
        saved[name] = sys.modules.pop(name, None)
    sys.modules.update(build_modules())
    SCHEDULER.pending.clear()
    return saved


def uninstall(saved):
    for name in list(build_modules()) + list(GUI_MODULES):
        sys.modules.pop(name, None)
        if saved.get(name) is not None:
            sys.modules[name] = saved[name]
