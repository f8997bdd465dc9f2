"""Execute the wandb branch of ExperimentLogger with a stub wandb module.

The live wandb service is unreachable in this environment (zero egress), so
these tests inject a recording stub into sys.modules and drive the real
adapter code (reference parity: training/viz.py:110-221 media logging and
the wandb.init/run.log call surface) — init kwargs, media wrapper types,
audio layout ([C, T] in -> [T, C] to wandb.Audio), step threading, finish,
and the degrade-to-console path when wandb.init raises.
"""

import sys
import types

import numpy as np
import pytest


class _Recorder:
    def __init__(self):
        self.logged = []
        self.finished = False
        self.id = "stub-run-id"

    def log(self, metrics, step=None):
        self.logged.append((metrics, step))

    def finish(self):
        self.finished = True


def _make_stub(fail_init=False):
    stub = types.ModuleType("wandb")
    rec = _Recorder()

    class Audio:
        def __init__(self, data, sample_rate=None, caption=None):
            self.data = np.asarray(data)
            self.sample_rate = sample_rate
            self.caption = caption

    class Image:
        def __init__(self, obj):
            self.obj = obj

    class Object3D:
        def __init__(self, points):
            self.points = np.asarray(points)

    def init(project=None, name=None, config=None, dir=None):
        if fail_init:
            raise RuntimeError("no service")
        stub.init_kwargs = dict(project=project, name=name, config=config, dir=dir)
        return rec

    stub.Audio, stub.Image, stub.Object3D, stub.init = Audio, Image, Object3D, init
    stub.rec = rec
    return stub


@pytest.fixture
def stub_wandb(monkeypatch):
    stub = _make_stub()
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return stub


def test_wandb_branch_logs_metrics_and_media(stub_wandb, tmp_path):
    from friendly_stable_audio_tools_tpu.training.logging import ExperimentLogger

    lg = ExperimentLogger(project="proj", name="run1", config={"lr": 1e-4},
                          save_dir=str(tmp_path))
    assert lg.run is stub_wandb.rec
    assert lg.run_id == "stub-run-id"
    assert stub_wandb.init_kwargs == {"project": "proj", "name": "run1",
                                      "config": {"lr": 1e-4}, "dir": str(tmp_path)}

    lg.log({"train/loss": 0.5}, step=3)
    audio_ct = np.zeros((2, 100), np.float32)  # [C, T] public layout
    lg.log_audio("demo/a", audio_ct, 44100, step=3, caption="cap")
    lg.log_image("demo/img", object(), step=3)
    pts = np.zeros((16, 6), np.float32)
    lg.log_object3d("demo/pca", pts, step=3)
    lg.finish()

    (m0, s0), (ma, sa), (mi, si), (mo, so) = stub_wandb.rec.logged
    assert m0 == {"train/loss": 0.5} and s0 == 3
    a = ma["demo/a"]
    assert isinstance(a, stub_wandb.Audio)
    assert a.data.shape == (100, 2)  # transposed to wandb's [T, C]
    assert a.sample_rate == 44100 and a.caption == "cap" and sa == 3
    assert isinstance(mi["demo/img"], stub_wandb.Image) and si == 3
    o = mo["demo/pca"]
    assert isinstance(o, stub_wandb.Object3D) and o.points.shape == (16, 6) and so == 3
    assert stub_wandb.rec.finished


def test_wandb_init_failure_degrades_to_console(monkeypatch, capsys):
    monkeypatch.setitem(sys.modules, "wandb", _make_stub(fail_init=True))
    from friendly_stable_audio_tools_tpu.training.logging import ExperimentLogger

    lg = ExperimentLogger(project="p", name="n")
    assert lg.run is None and lg.run_id == "n"
    lg.log({"loss": 1.25}, step=7)
    assert "loss=1.25" in capsys.readouterr().out
    # media calls are no-ops, not crashes
    lg.log_audio("a", np.zeros((2, 10)), 44100, step=7)
    lg.log_image("i", object(), step=7)
    lg.log_object3d("o", np.zeros((4, 6)), step=7)
    lg.finish()


@pytest.mark.slow
def test_demo_callback_routes_media_through_wandb(stub_wandb, tmp_path):
    """AutoencoderDemoCallback end-to-end into the stub: audio + latent-PCA
    Object3D arrive via run.log (the melspec Image additionally requires
    matplotlib, present in this env)."""
    from tests.test_autoencoder import tiny_ae
    from friendly_stable_audio_tools_tpu.models.bottleneck import VAEBottleneck
    from friendly_stable_audio_tools_tpu.training.autoencoders import AutoencoderTrainingWrapper
    from friendly_stable_audio_tools_tpu.training.demos import AutoencoderDemoCallback
    from friendly_stable_audio_tools_tpu.training.logging import ExperimentLogger
    from tests.test_training_autoencoder import LOSS_CONFIG, OPT_CONFIGS

    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    wrapper = AutoencoderTrainingWrapper(ae, loss_config=LOSS_CONFIG,
                                         optimizer_configs=OPT_CONFIGS,
                                         warmup_steps=4, sample_rate=16000)
    state = wrapper.init_state(example_length=512)

    class T:
        pass

    t = T()
    t.wrapper = wrapper
    t.save_dir = str(tmp_path)
    t.logger = ExperimentLogger(project="p", name="demo", save_dir=str(tmp_path))
    assert t.logger.run is stub_wandb.rec  # wandb branch active

    reals = np.random.default_rng(0).standard_normal((2, 2, 512)).astype(np.float32) * 0.1
    cb = AutoencoderDemoCallback(demo_every=2, sample_rate=16000)
    cb.run_demo(t, state, 2, (reals, [{}] * 2))

    types_logged = [type(next(iter(m.values()))).__name__ for m, _ in stub_wandb.rec.logged]
    assert "Audio" in types_logged
    assert "Object3D" in types_logged
