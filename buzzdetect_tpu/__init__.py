"""buzzdetect_tpu — a TPU-native streaming bioacoustics inference framework.

Capabilities mirror OSU-Bee-Lab/buzzdetect (see SURVEY.md): chunked streaming
analysis of arbitrarily long recordings through a YAMNet-style log-mel +
MobileNet embedder and pluggable classifier heads, producing resumable
per-frame CSV activations/detections — rebuilt JAX/XLA-first with a C++
libav decode stage and data-parallel sharding over TPU meshes.
"""

__version__ = '0.1.0'

__all__ = ['analyze', 'Analyzer', 'score_file', 'stream_scores']


def __getattr__(name):
    # Lazy imports so `import buzzdetect_tpu` stays cheap (no jax/TF at
    # import). The results are PINNED into the package namespace: importing
    # the `buzzdetect_tpu.analysis` submodule sets a package attribute of the
    # same name, which would otherwise shadow the analyze() function on
    # every access after the first.
    if name in ('analyze', 'Analyzer'):
        from buzzdetect_tpu.analysis import analyze, Analyzer
        globals()['analyze'] = analyze
        globals()['Analyzer'] = Analyzer
        return globals()[name]
    if name in ('score_file', 'stream_scores'):
        from buzzdetect_tpu.api import score_file, stream_scores
        globals()['score_file'] = score_file
        globals()['stream_scores'] = stream_scores
        return globals()[name]
    raise AttributeError(name)
