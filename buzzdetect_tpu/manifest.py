"""Output-folder manifest: guards result-schema compatibility across resumes.

The manifest lives in the output directory and records every setting that
determines the schema or resumability of the result files there, so a later
run cannot silently append incompatible rows (e.g. a different class subset)
to existing partial results.

Contract parity with reference `src/pipeline/manifest.py:10-85`: same file
name, same locked keys, same order-insensitive classes comparison — result
folders written by the reference are resumable by this framework and vice
versa.
"""

import json
import os

FNAME_MANIFEST = 'buzzdetect_manifest.json'

# Fields that must match for a run to safely write into an existing folder.
KEYS_LOCKED = ('modelname', 'output_mode', 'classes_out', 'precision', 'framehop_prop')


def build_manifest(modelname, framehop_prop, precision, classes_out):
    output_mode = 'detections' if precision is not None else 'activations'
    return {
        'modelname': modelname,
        'output_mode': output_mode,
        # classes only affect the schema in activations mode; sorted so the
        # user's selection order is irrelevant
        'classes_out': sorted(classes_out) if output_mode == 'activations' else None,
        'precision': precision,
        'framehop_prop': framehop_prop,
    }


def read_manifest(dir_out):
    path = os.path.join(dir_out, FNAME_MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path, 'r') as f:
        return json.load(f)


def write_manifest(dir_out, manifest):
    os.makedirs(dir_out, exist_ok=True)
    with open(os.path.join(dir_out, FNAME_MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=2)


def diff_manifests(existing, current):
    """Human-readable list of locked-key conflicts between two manifests."""
    conflicts = []
    for key in KEYS_LOCKED:
        old, new = existing.get(key), current.get(key)
        if key == 'classes_out' and old is not None and new is not None:
            if set(old) != set(new):
                added = sorted(set(new) - set(old))
                removed = sorted(set(old) - set(new))
                parts = []
                if added:
                    parts.append(f"added {', '.join(added)}")
                if removed:
                    parts.append(f"removed {', '.join(removed)}")
                conflicts.append(f"output classes differ ({'; '.join(parts)})")
        elif old != new:
            conflicts.append(f'{key}: existing={old!r}, requested={new!r}')
    return conflicts


def check_or_write_manifest(dir_out, manifest):
    """Reconcile a run's settings with an existing manifest.

    Returns ``(ok, message)``. Writes a new manifest when none exists; refuses
    (without writing) when the existing one conflicts.
    """
    existing = read_manifest(dir_out)
    if existing is None:
        write_manifest(dir_out, manifest)
        return True, None

    conflicts = diff_manifests(existing, manifest)
    if conflicts:
        msg = (
            f"Results have already been written to '{dir_out}' using different "
            f"settings, so new results would be incompatible with the existing "
            f"files:\n  - " + '\n  - '.join(conflicts)
            + '\nEither match the existing settings, or choose an empty output folder.'
        )
        return False, msg
    return True, None
