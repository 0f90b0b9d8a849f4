"""Multi-chip parallelism tests on the virtual 8-device CPU mesh: sharded
inference equals single-device inference; file sharding is a stable
partition; head/full training steps compile and run over DP and DPxTP meshes.
"""

import numpy as np
import pytest

import jax
from buzzdetect_tpu.parallel import make_mesh, shard_files
from buzzdetect_tpu.models.classifier import ChunkClassifier
from buzzdetect_tpu.models import yamnet as yam
from buzzdetect_tpu.models.heads import init_head

RNG = np.random.default_rng(0)


@pytest.fixture(scope='module')
def arrays():
    raw = yam.init_raw_params(seed=4)
    folded = yam.fold_batchnorm(raw)
    a = {f'yamnet/{k}': v for k, v in folded.items()}
    a.update(init_head(1024, 5, seed=4))
    return a


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ('data',)


def test_sharded_inference_matches_single(arrays):
    wav = (RNG.standard_normal(int(9.6 * 16000)) * 0.1).astype(np.float32)

    single = ChunkClassifier(arrays, framehop_prop=1.0).predict(wav)

    mesh = make_mesh(8)
    sharded = ChunkClassifier(arrays, framehop_prop=1.0,
                              mesh=mesh).predict(wav)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_sharded_inference_uneven_patches(arrays):
    # 7 patches over 8 devices: GSPMD must handle the ragged shard
    wav = (RNG.standard_normal(int(6.7 * 16000)) * 0.1).astype(np.float32)
    mesh = make_mesh(8)
    single = ChunkClassifier(arrays, framehop_prop=1.0).predict(wav)
    sharded = ChunkClassifier(arrays, framehop_prop=1.0,
                              mesh=mesh).predict(wav)
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_shard_files_partition():
    paths = [f'audio/file{i:04d}.wav' for i in range(200)]
    shards = [shard_files(paths, host_id=h, n_hosts=4) for h in range(4)]
    # complete and disjoint
    union = sorted(p for s in shards for p in s)
    assert union == sorted(paths)
    # stable regardless of listing order
    reordered = shard_files(list(reversed(paths)), host_id=2, n_hosts=4)
    assert sorted(reordered) == sorted(shards[2])
    # single host gets everything
    assert shard_files(paths, host_id=0, n_hosts=1) == paths


def test_head_train_step_dp_tp():
    from buzzdetect_tpu.train.trainer import train_head
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ('data', 'model'))
    emb = RNG.standard_normal((64, 1024)).astype(np.float32)
    labels = (RNG.random((64, 3)) > 0.7).astype(np.float32)
    with mesh:
        params, losses = train_head(emb, labels, epochs=3, batch_size=32,
                                    mesh=mesh)
    assert params['head/kernel'].shape == (1024, 3)
    # loss must decrease
    assert losses[-1] < losses[0]


def test_head_training_learns_separable_data():
    from buzzdetect_tpu.train.trainer import train_head
    # embeddings where class 0 is linearly separable on one dimension
    n = 256
    emb = RNG.standard_normal((n, 1024)).astype(np.float32)
    labels = np.zeros((n, 2), np.float32)
    labels[:, 0] = (emb[:, 7] > 0).astype(np.float32)
    labels[:, 1] = (emb[:, 11] > 0).astype(np.float32)
    params, losses = train_head(emb, labels, epochs=30, batch_size=64,
                                learning_rate=0.01)
    logits = emb @ params['head/kernel'] + params['head/bias']
    acc = ((logits[:, 0] > 0) == (labels[:, 0] > 0.5)).mean()
    assert acc > 0.9


def test_full_train_step_runs_and_learns():
    from buzzdetect_tpu.train.trainer import (make_full_train_step,
                                              init_full_train)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ('data', 'model'))
    params, opt_state, tx = init_full_train(n_classes=3, learning_rate=1e-3)
    step = make_full_train_step(tx, mesh=mesh)
    wav = (RNG.standard_normal((4, 15600)) * 0.1).astype(np.float32)
    labels = np.zeros((4, 3), np.float32)
    labels[:2, 0] = 1
    losses = []
    with mesh:
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, wav, labels)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_analyze_with_mesh(tmp_path, monkeypatch):
    """Top-level multi-chip inference: analyze(mesh=...) shards each chunk's
    patch axis across the 8 virtual devices; results match the unsharded run."""
    import os
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.models.convert import build_model_bundle
    from buzzdetect_tpu.parallel import make_mesh
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'pm'), classes=['a', 'ins_buzz'],
                       seed=9)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))
    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    write_wav(dir_audio / 't.wav', make_tone(4.0, 16000), 16000)

    analyze(modelname='pm', dir_audio=str(dir_audio),
            dir_out=str(tmp_path / 'single'), chunklength=4.0,
            verbosity_print='ERROR')
    analyze(modelname='pm', dir_audio=str(dir_audio),
            dir_out=str(tmp_path / 'meshed'), chunklength=4.0,
            verbosity_print='ERROR', mesh=make_mesh(8))

    a = open(tmp_path / 'single' / 't_buzzdetect.csv').read()
    b = open(tmp_path / 'meshed' / 't_buzzdetect.csv').read()
    assert a == b


def test_shard_files_root_relative_agreement():
    """Hosts mounting the corpus at different absolute paths must agree on
    every file's owner — the hash covers the root-relative path."""
    rel = [f'site{i}/rec{j}.wav' for i in range(3) for j in range(5)]
    a = [f'/data/audio/{r}' for r in rel]
    b = [f'/mnt/shared/audio/{r}' for r in rel]
    for host in range(4):
        mine_a = shard_files(a, host_id=host, n_hosts=4, root='/data/audio')
        mine_b = shard_files(b, host_id=host, n_hosts=4,
                             root='/mnt/shared/audio')
        assert ([p[len('/data/audio/'):] for p in mine_a]
                == [p[len('/mnt/shared/audio/'):] for p in mine_b])


def test_make_mesh_2d_for_trainer():
    """make_mesh must be able to build the DPxTP ('data','model') mesh the
    trainer's sharding requires."""
    import jax
    n = len(jax.devices())
    if n < 4:
        import pytest
        pytest.skip('needs >= 4 virtual devices')
    mesh = make_mesh(shape=(n // 2, 2), axes=('data', 'model'))
    assert mesh.axis_names == ('data', 'model')
    assert mesh.devices.shape == (n // 2, 2)


# --- per-chip replica data parallelism (analyze(devices=...)) ----------------

def _replica_env(tmp_path, monkeypatch, n_files=5):
    import os
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from tests.audio_fixtures import make_tone, write_wav
    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'rm'), classes=['a', 'ins_buzz'],
                       seed=11)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))
    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    for i in range(n_files):
        write_wav(dir_audio / f'r{i}.wav',
                  make_tone(3.0 + i, 16000, 200 + 60 * i), 16000)
    return str(dir_audio)


def test_resolve_replica_devices():
    from buzzdetect_tpu.parallel import resolve_replica_devices
    local = jax.local_devices()
    assert resolve_replica_devices(3) == local[:3]
    assert resolve_replica_devices('all') == local
    assert resolve_replica_devices([local[2]]) == [local[2]]
    with pytest.raises(ValueError):
        resolve_replica_devices(0)
    with pytest.raises(ValueError):
        resolve_replica_devices(len(local) + 1)  # never silently shrink
    with pytest.raises(ValueError):
        resolve_replica_devices([])


def test_analyze_with_replica_devices_matches_single(tmp_path, monkeypatch):
    """analyze(devices=N) — N independent device-pinned classifier replicas,
    each with its own dispatch thread — must produce results byte-identical
    to the single-device run (same weights, same programs, deterministic)."""
    import os
    from buzzdetect_tpu.analysis import analyze
    dir_audio = _replica_env(tmp_path, monkeypatch)

    analyze(modelname='rm', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'single'), chunklength=2.0,
            verbosity_print='ERROR')
    a = analyze(modelname='rm', dir_audio=dir_audio,
                dir_out=str(tmp_path / 'replicas'), chunklength=2.0,
                verbosity_print='ERROR', devices=4, n_streamers=2)

    # one dispatch thread per replica, each pinned to a distinct device
    assert a.coordinator.analyzers_total == 4
    assert a.replica_models is not None and len(a.replica_models) == 4
    pinned = [m._device for m in a.replica_models]
    assert pinned == jax.local_devices()[:4]
    for m in a.replica_models:  # params really live on the pinned chip
        arr = next(iter(m.classifier._device_params()['yamnet'].values()))
        assert list(arr.devices()) == [m._device]

    for i in range(5):
        got = open(tmp_path / 'replicas' / f'r{i}_buzzdetect.csv').read()
        want = open(tmp_path / 'single' / f'r{i}_buzzdetect.csv').read()
        assert got == want, f'replica-mode results differ for r{i}'


def test_analyze_devices_and_mesh_mutually_exclusive(tmp_path, monkeypatch):
    from buzzdetect_tpu.analysis import analyze
    dir_audio = _replica_env(tmp_path, monkeypatch, n_files=1)
    with pytest.raises(ValueError, match='mutually exclusive'):
        analyze(modelname='rm', dir_audio=dir_audio,
                dir_out=str(tmp_path / 'out'), devices=2, mesh=make_mesh(4))


# --- multi-host data parallelism (analyze(host_shard=...)) -------------------

def test_analyze_host_shard_concurrent_hosts(tmp_path, monkeypatch):
    """Two CONCURRENT 'hosts' (separate processes), one shared output
    directory, zero coordination: each analyzes its stable hash shard of
    the corpus; together they complete every file, byte-identical to a
    single-host run — the §2c multi-host story attested end to end."""
    import os
    import subprocess
    import sys
    dir_audio = _replica_env(tmp_path, monkeypatch, n_files=6)
    dir_models = str(tmp_path / 'models')
    dir_out = str(tmp_path / 'shared_out')

    child = (
        'import sys\n'
        'from buzzdetect_tpu import config as cfg\n'
        'cfg.DIR_MODELS = sys.argv[1]\n'
        'from buzzdetect_tpu.analysis import analyze\n'
        'analyze(modelname="rm", dir_audio=sys.argv[2], dir_out=sys.argv[3],\n'
        '        chunklength=2.0, verbosity_print="ERROR",\n'
        '        host_shard=(int(sys.argv[4]), int(sys.argv[5])))\n')
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu'}
    procs = [subprocess.Popen(
        [sys.executable, '-c', child, dir_models, dir_audio, dir_out,
         str(h), '2'], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE) for h in range(2)]
    for p in procs:
        _out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    # a fresh single-host oracle
    from buzzdetect_tpu.analysis import analyze
    analyze(modelname='rm', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'oracle'), chunklength=2.0,
            verbosity_print='ERROR')
    for i in range(6):
        got = open(os.path.join(dir_out, f'r{i}_buzzdetect.csv')).read()
        want = open(tmp_path / 'oracle' / f'r{i}_buzzdetect.csv').read()
        assert got == want, f'host-sharded result differs for r{i}'
    leftovers = [f for f in os.listdir(dir_out) if f.endswith('_buzzpart.csv')]
    assert leftovers == []

    # the shard partition is complete and disjoint: rerunning either host
    # over the finished dir exits 'fully analyzed' without touching files
    before = {f: os.path.getmtime(os.path.join(dir_out, f))
              for f in os.listdir(dir_out) if f.endswith('.csv')}
    p = subprocess.run(
        [sys.executable, '-c', child, dir_models, dir_audio, dir_out,
         '0', '2'], env=env, capture_output=True, timeout=600)
    assert p.returncode == 0
    after = {f: os.path.getmtime(os.path.join(dir_out, f))
             for f in os.listdir(dir_out) if f.endswith('.csv')}
    assert before == after


def test_host_shard_validation():
    from buzzdetect_tpu.analysis import Analyzer
    with pytest.raises(ValueError, match='host_shard'):
        Analyzer(modelname='whatever', host_shard=(4, 2),
                 model=object.__new__(object))
    # non-tuple misuse must hit the crafted message, not a raw unpack
    # TypeError: host_shard=1 ("host 1"?) and the CLI-style string '0/4'
    # are the likely API typos
    for bad in (1, '0/4', (0,), (0, 2, 4), (0.0, 2), (True, 2)):
        with pytest.raises(ValueError, match='host_shard must be'):
            Analyzer(modelname='whatever', host_shard=bad,
                     model=object.__new__(object))


def test_resolve_replica_devices_rejects_stray_strings():
    """devices='4' (Python API misuse) must fail at validation, not fall
    through to list('4') and die deep inside device_put."""
    from buzzdetect_tpu.parallel import resolve_replica_devices
    with pytest.raises(ValueError):
        resolve_replica_devices('4')
    with pytest.raises(ValueError):
        resolve_replica_devices(True)


def test_host_shard_composes_with_replica_devices(tmp_path, monkeypatch):
    """The two scale-out axes compose: a host analyzing its corpus shard
    can still fan its chunks across per-chip replicas; union of both
    hosts' sharded+replicated runs equals the single-host oracle."""
    import os
    from buzzdetect_tpu.analysis import analyze
    dir_audio = _replica_env(tmp_path, monkeypatch, n_files=4)
    dir_out = str(tmp_path / 'out')

    for host in range(2):
        a = analyze(modelname='rm', dir_audio=dir_audio, dir_out=dir_out,
                    chunklength=2.0, verbosity_print='ERROR',
                    host_shard=(host, 2), devices=2, n_streamers=1)
        assert a.coordinator.analyzers_total == 2

    analyze(modelname='rm', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'oracle'), chunklength=2.0,
            verbosity_print='ERROR')
    for i in range(4):
        got = open(os.path.join(dir_out, f'r{i}_buzzdetect.csv')).read()
        want = open(tmp_path / 'oracle' / f'r{i}_buzzdetect.csv').read()
        assert got == want


def test_replicas_compose_with_mulaw_and_device_resample(tmp_path,
                                                         monkeypatch):
    """Triple composition: per-chip replicas x mu-law wire x on-device
    resampling (48 kHz source) equals the single-device run with the same
    wire configuration."""
    import os
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'rc'), classes=['a', 'ins_buzz'],
                       seed=13)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))
    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    for i in range(2):
        write_wav(dir_audio / f'hi{i}.wav', make_tone(3.0, 48000, 500 + i * 70),
                  48000)

    kw = dict(modelname='rc', dir_audio=str(dir_audio), chunklength=2.0,
              verbosity_print='ERROR', transfer_dtype='mulaw',
              resample_on_device=True)
    analyze(dir_out=str(tmp_path / 'single'), **kw)
    analyze(dir_out=str(tmp_path / 'replicas'), devices=2, **kw)
    for i in range(2):
        got = open(os.path.join(tmp_path, 'replicas',
                                f'hi{i}_buzzdetect.csv')).read()
        want = open(os.path.join(tmp_path, 'single',
                                 f'hi{i}_buzzdetect.csv')).read()
        assert got == want


def test_multiple_dispatch_threads_per_replica(tmp_path, monkeypatch):
    """In replica mode analyzers_cpu means dispatch threads PER replica
    (the per-chip version of the reference's 'multiple GPU analyzers'
    knob): devices=2 x analyzers_cpu=2 -> 4 threads sharing 2 device-pinned
    classifiers, results still byte-identical."""
    import os
    from buzzdetect_tpu.analysis import analyze
    dir_audio = _replica_env(tmp_path, monkeypatch, n_files=4)

    analyze(modelname='rm', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'single'), chunklength=2.0,
            verbosity_print='ERROR')
    a = analyze(modelname='rm', dir_audio=dir_audio,
                dir_out=str(tmp_path / 'multi'), chunklength=2.0,
                verbosity_print='ERROR', devices=2, analyzers_cpu=2)
    assert a.coordinator.analyzers_total == 4
    assert len(a.replica_models) == 4
    assert len({id(m) for m in a.replica_models}) == 2  # 2 shared replicas
    devices_used = [m._device for m in a.replica_models]
    assert devices_used == sorted(devices_used, key=str)  # grouped by chip

    for i in range(4):
        got = open(os.path.join(tmp_path, 'multi',
                                f'r{i}_buzzdetect.csv')).read()
        want = open(os.path.join(tmp_path, 'single',
                                 f'r{i}_buzzdetect.csv')).read()
        assert got == want


def test_full_train_checkpoint_resume_on_mesh(tmp_path):
    """Training checkpoints compose with GSPMD sharding: a DPxTP
    fine-tune interrupted at epoch 1 and resumed on the mesh lands on the
    same parameters as the uninterrupted mesh run (the checkpoint gathers
    sharded leaves to host numpy and the resume re-shards them)."""
    from jax.sharding import Mesh
    from buzzdetect_tpu.train.clips import train_full_model
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ('data', 'model'))
    rng = np.random.default_rng(3)
    clips = (rng.standard_normal((8, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((8, 2)) > 0.5).astype(np.float32)
    kw = dict(batch_size=4, learning_rate=1e-3, log=lambda *_: None,
              mesh=mesh)

    with mesh:
        gold_raw, gold_head, gold_losses = train_full_model(
            clips, labels, epochs=2, **kw)
        ckpt = str(tmp_path / 'work')
        train_full_model(clips, labels, epochs=1, checkpoint_dir=ckpt, **kw)
        raw, head, losses = train_full_model(
            clips, labels, epochs=2, checkpoint_dir=ckpt, **kw)

    assert losses == gold_losses
    for k in gold_raw:
        np.testing.assert_allclose(raw[k], gold_raw[k], rtol=0, atol=1e-6,
                                   err_msg=k)
    for k in gold_head:
        np.testing.assert_allclose(head[k], gold_head[k], rtol=0, atol=1e-6,
                                   err_msg=k)
