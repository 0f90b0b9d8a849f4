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
    # lazy import so `import buzzdetect_tpu` stays cheap (no jax/TF at import)
    if name in ('analyze', 'Analyzer'):
        from buzzdetect_tpu.analyze import analyze, Analyzer
        return {'analyze': analyze, 'Analyzer': Analyzer}[name]
    if name in ('score_file', 'stream_scores'):
        from buzzdetect_tpu.api import score_file, stream_scores
        return {'score_file': score_file, 'stream_scores': stream_scores}[name]
    raise AttributeError(name)
