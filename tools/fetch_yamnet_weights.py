#!/usr/bin/env python
"""Attempt to acquire the pretrained YAMNet embedder weights, from every
source that could plausibly exist in this environment, and record the
attempt as an evidence log (docs/weights_acquisition.md).

The published blob is `yamnet.h5` (URL recorded at reference
`embedders/yamnet/BUILD.py:11`: https://storage.googleapis.com/audioset/yamnet.h5).
On success the flagship bundle is rebuilt via tools/import_reference_model.py
so the framework goes from numerically-correct to semantically-trained in
one command.

Usage: python tools/fetch_yamnet_weights.py [--dest PATH] [--no-rebuild]
"""

import argparse
import datetime
import glob
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

URLS = [
    'https://storage.googleapis.com/audioset/yamnet.h5',
    'https://tfhub.dev/google/yamnet/1?tf-hub-format=compressed',
]

# places a cached/mounted copy could appear between rounds. Deliberately
# NOT /tmp: the test suite writes synthetic same-shape yamnet.h5 fixtures
# there (tests/test_convert_h5.py) which must never be mistaken for the
# pretrained blob.
SEARCH_GLOBS = [
    '/root/reference/embedders/yamnet/weights_keras2/yamnet.h5',
    '/root/reference/**/yamnet.h5',
    os.path.expanduser('~/.keras/**/yamnet*'),
    os.path.expanduser('~/.cache/**/yamnet*'),
    '/opt/**/yamnet.h5',
    '/data/**/yamnet.h5',
    '/mnt/**/yamnet.h5',
]

LOG_PATH = os.path.join(os.path.dirname(__file__), '..', 'docs',
                        'weights_acquisition.md')


def _is_hdf5(path):
    try:
        with open(path, 'rb') as f:
            return f.read(8) == b'\x89HDF\r\n\x1a\n'
    except OSError:
        return False


def _try_url(url, dest, lines):
    """Download to dest ATOMICALLY and only when the payload really is an
    HDF5 file. A direct-to-dest write would leave a truncated/garbage
    yamnet.h5 behind on a dropped connection or a 200-OK error page (or
    tfhub's tar.gz), which a later import run would trust."""
    import urllib.request
    part = dest + '.part'
    try:
        with urllib.request.urlopen(url, timeout=30) as r, \
                open(part, 'wb') as f:
            shutil.copyfileobj(r, f)
        if not _is_hdf5(part):
            size = os.path.getsize(part)
            os.remove(part)
            lines.append(f'- `{url}` -> FAIL: fetched {size} bytes but not '
                         f'an HDF5 file (error page or archive format); '
                         f'discarded')
            return False
        os.replace(part, dest)
        lines.append(f'- `{url}` -> OK ({os.path.getsize(dest)} bytes, '
                     f'HDF5 magic verified)')
        return True
    except Exception as e:
        if os.path.exists(part):
            os.remove(part)
        lines.append(f'- `{url}` -> FAIL: {type(e).__name__}: {e}')
        return False


def _try_local(dest, lines):
    for pattern in SEARCH_GLOBS:
        hits = [h for h in glob.glob(pattern, recursive=True)
                if os.path.isfile(h) and os.path.getsize(h) > 1_000_000
                and 'pytest' not in h]
        hits = [h for h in hits if _is_hdf5(h)]  # 'yamnet*' can glob caches
        if hits:
            shutil.copyfile(hits[0], dest)
            lines.append(f'- local `{pattern}` -> OK ({hits[0]})')
            return True
        lines.append(f'- local `{pattern}` -> no usable file')
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dest', default=os.path.join(
        os.path.dirname(__file__), '..', 'models', 'yamnet.h5'))
    ap.add_argument('--no-rebuild', action='store_true')
    args = ap.parse_args()

    stamp = datetime.datetime.now().strftime('%Y-%m-%d %H:%M:%S')
    lines = [f'\n## Attempt {stamp}\n']

    got = _try_local(args.dest, lines)
    if not got:
        for url in URLS:
            if _try_url(url, args.dest, lines):
                got = True
                break

    lines.append(f'\n**Result: {"ACQUIRED" if got else "unavailable"}**\n')
    os.makedirs(os.path.dirname(LOG_PATH), exist_ok=True)
    new_file = not os.path.exists(LOG_PATH)
    with open(LOG_PATH, 'a') as f:
        if new_file:
            f.write('# YAMNet pretrained weight acquisition log\n\n'
                    'Evidence of per-round attempts to obtain `yamnet.h5` '
                    '(the published AudioSet\nembedder weights; this '
                    'environment has no network egress). The importer path\n'
                    'is proven by synthetic fixtures in '
                    '`tests/test_convert_h5.py`, so acquisition is\nthe '
                    'only remaining step.\n')
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))

    if got and not args.no_rebuild:
        print('rebuilding flagship bundle with pretrained weights...')
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     'import_reference_model.py'),
                        '--yamnet-h5', args.dest], check=True)
    return 0 if got else 1


if __name__ == '__main__':
    sys.exit(main())
