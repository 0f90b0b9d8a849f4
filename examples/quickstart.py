#!/usr/bin/env python
"""Quickstart: synthesize a minute of 'field audio', analyze it, and print
the strongest class per frame. Run: python examples/quickstart.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    from buzzdetect_tpu import analyze
    from buzzdetect_tpu.write.trim import read_results
    import wave

    with tempfile.TemporaryDirectory() as td:
        dir_audio = os.path.join(td, 'audio')
        os.makedirs(dir_audio)

        # a minute of "field recording": ambient noise with a buzzy segment
        rate = 16000
        t = np.arange(60 * rate) / rate
        x = 0.02 * np.random.default_rng(0).standard_normal(len(t))
        buzz = (20 <= t) & (t < 25)
        x[buzz] += sum(0.15 / k * np.sin(2 * np.pi * 220 * k * t[buzz])
                       for k in (1, 2, 3))
        with wave.open(os.path.join(dir_audio, 'field.wav'), 'wb') as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((np.clip(x, -1, 1) * 32767).astype('<i2').tobytes())

        dir_out = os.path.join(td, 'results')
        analyze(modelname='model_general_v3', dir_audio=dir_audio,
                dir_out=dir_out, verbosity_print='WARNING')

        starts, cols = read_results(
            os.path.join(dir_out, 'field_buzzdetect.csv'))
        names = list(cols)
        scores = np.stack([cols[n] for n in names], axis=1)
        print('\nframe  strongest class            activation')
        for i in range(0, len(starts), 5):
            j = scores[i].argmax()
            print(f'{starts[i]:5.1f}s  {names[j]:<26s} {scores[i, j]:+.2f}')

        # the archival workflow: threshold the stored activations AFTER
        # the fact and coalesce detected frames into events — re-callable
        # at any threshold without re-analysis
        from buzzdetect_tpu.write.detections import \
            call_detections_directory
        events = call_detections_directory(dir_out, threshold=-2.0)
        print(f'\n{len(events)} ins_buzz event(s) at threshold -2.0:')
        for e in events:
            print(f"  {e['ident']}: {e['start']:.2f}-{e['end']:.2f}s "
                  f"(peak {e['activation_max']:+.2f})")


if __name__ == '__main__':
    main()
