"""Tabular benchmark tests against tiny fake-data fixtures.

The reference exercises every discovered benchmark
(``/root/reference/tests/benchmarking/benchmarks_test.py:23-134``) but needs
the real HPOBench/FCNet/PD1 data blobs.  Here each wrapper runs against a
synthetic fixture: a tiny HDF5 LUT for FCNet, a tiny pickle dataframe for
PD1, and an in-memory ``hpobench``/``ConfigSpace`` stub for HPOBenchTabular —
so the full logic (table lookups, optimum computation, meta-data generation,
the ConfigSpace bridge, and a short ScaMLGPBO study through each wrapper)
executes in CI without external downloads.
"""

import itertools
import sys
import types

import numpy as np
import pytest

from scamlgp_tpu.benchmarking.benchmarks.fcnet_fixed_fidelity_tabular import (
    FCNetFixedFidelityTabularBenchmark,
    _load_look_up_table,
)
from scamlgp_tpu.bo.core import EvaluationSpecification, Objective

# ---------------------------------------------------------------------------
# FCNet: tiny HDF5 lookup tables
# ---------------------------------------------------------------------------

#: Pin 7 of 9 FCNet parameters so the free space (activation_fn_1 x n_units_1,
#: 2 x 6 = 12 configs) is small enough to enumerate in the fixture LUT.
FCNET_FIXED = {
    "activation_fn_2": "tanh", "batch_size": 16, "dropout_1": 0.0,
    "dropout_2": 0.3, "init_lr": 0.001, "lr_schedule": "cosine",
    "n_units_2": 64,
}


def _write_fcnet_lut(path, value_seed: int, n_seeds: int = 2,
                     n_epochs: int = 3) -> dict:
    """Enumerate the free FCNet sub-space into an HDF5 LUT shaped like the
    real dataset (per-config ``valid_loss`` of shape (seeds, epochs)).
    Returns the expected {lut_key: mean valid_loss at last epoch} dict."""
    import h5py

    rng = np.random.default_rng(value_seed)
    expected = {}
    with h5py.File(path, "w") as fh:
        for act, units in itertools.product(["tanh", "relu"],
                                            [16, 32, 64, 128, 256, 512]):
            config = {"activation_fn_1": act, "n_units_1": units,
                      **FCNET_FIXED}
            key = FCNetFixedFidelityTabularBenchmark._lut_key(config)
            losses = rng.uniform(0.01, 1.0, size=(n_seeds, n_epochs))
            fh.create_group(key)
            fh[key].create_dataset("valid_loss", data=losses)
            expected[key] = float(np.mean(losses[:, -1]))
    return expected


@pytest.fixture
def fcnet_files(tmp_path):
    """(target_file, [meta_files], expected_target_lut)."""
    target = tmp_path / "fcnet_slice_localization_data.hdf5"
    meta1 = tmp_path / "fcnet_protein_structure_data.hdf5"
    meta2 = tmp_path / "fcnet_naval_propulsion_data.hdf5"
    expected = _write_fcnet_lut(target, value_seed=0)
    _write_fcnet_lut(meta1, value_seed=1)
    _write_fcnet_lut(meta2, value_seed=2)
    return str(target), [str(meta1), str(meta2)], expected


def test_fcnet_lut_lookup_matches_table(fcnet_files):
    target, metas, expected = fcnet_files
    b = FCNetFixedFidelityTabularBenchmark(
        target_task_file=target, fix_search_space=FCNET_FIXED, seed=3)
    assert b._target_task_lut is None  # lazy until first evaluation
    config = {"activation_fn_1": "relu", "n_units_1": 128, **FCNET_FIXED}
    ev = b(EvaluationSpecification(configuration=config))
    key = FCNetFixedFidelityTabularBenchmark._lut_key(config)
    assert ev.objectives["valid_loss"] == pytest.approx(expected[key])
    assert b._target_task_lut is not None


def test_fcnet_every_sampled_config_resolves(fcnet_files):
    target, _, expected = fcnet_files
    b = FCNetFixedFidelityTabularBenchmark(
        target_task_file=target, fix_search_space=FCNET_FIXED, seed=11)
    for _ in range(20):
        config = b.search_space.sample()
        for name, v in FCNET_FIXED.items():
            assert config[name] == v
        ev = b(EvaluationSpecification(configuration=config))
        assert 0.0 < ev.objectives["valid_loss"] <= 1.0


def test_fcnet_optimum_is_known_table_value(fcnet_files):
    target, _, _ = fcnet_files
    b = FCNetFixedFidelityTabularBenchmark(target_task_file=target)
    # hard-coded known optimum for slice_localization
    # (reference fcnet_fixed_fidelity_tabular.py:25-82)
    assert b.optimum == pytest.approx(0.00019159916337230243)
    assert b.objective == Objective("valid_loss", False)
    assert b.output_dimensions == 1


def test_fcnet_meta_data_deterministic(fcnet_files):
    target, metas, _ = fcnet_files
    kw = dict(target_task_file=target, meta_task_files=metas,
              n_data_per_task=[5, 7], fix_search_space=FCNET_FIXED)
    md1 = FCNetFixedFidelityTabularBenchmark(**kw).get_meta_data(seed=42)
    md2 = FCNetFixedFidelityTabularBenchmark(**kw).get_meta_data(seed=42)
    md3 = FCNetFixedFidelityTabularBenchmark(**kw).get_meta_data(seed=43)
    assert set(md1) == {"fcnet_protein_structure_data",
                        "fcnet_naval_propulsion_data"}
    assert [len(v) for v in md1.values()] == [5, 7]
    for uid in md1:
        assert [e.configuration for e in md1[uid]] == \
               [e.configuration for e in md2[uid]]
        assert [e.objectives for e in md1[uid]] == \
               [e.objectives for e in md2[uid]]
    assert any(
        [e.configuration for e in md1[uid]] !=
        [e.configuration for e in md3[uid]] for uid in md1)


def test_fcnet_rejects_sobol_and_mismatched_meta(fcnet_files):
    target, metas, _ = fcnet_files
    b = FCNetFixedFidelityTabularBenchmark(
        target_task_file=target, meta_task_files=metas,
        n_data_per_task=[3, 3])
    with pytest.raises(NotImplementedError):
        b.get_meta_data(distribution="sobol")
    with pytest.raises(AssertionError):
        FCNetFixedFidelityTabularBenchmark(
            target_task_file=target, meta_task_files=metas,
            n_data_per_task=[3])


def test_fcnet_load_look_up_table_per_seed(fcnet_files):
    target, _, _ = fcnet_files
    mean_lut = _load_look_up_table(target)
    seed_lut = _load_look_up_table(target, i_seed=0)
    assert set(mean_lut) == set(seed_lut)
    assert any(abs(mean_lut[k] - seed_lut[k]) > 1e-12 for k in mean_lut)


def test_fcnet_scamlgp_bo_study(fcnet_files):
    """3-eval ScaMLGPBO study end-to-end through the FCNet wrapper."""
    from scamlgp_tpu.benchmarking.bbo_helper import run_with_bbo
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO

    target, metas, expected = fcnet_files
    b = FCNetFixedFidelityTabularBenchmark(
        target_task_file=target, meta_task_files=metas,
        n_data_per_task=[4, 4], fix_search_space=FCNET_FIXED, seed=5)
    evals = run_with_bbo(b, ScaMLGPBO,
                         {"seed": 1, "num_fit_steps": 8,
                          "num_restarts_log_likelihood": 1},
                         max_evaluations=3, meta_data_seed=7)
    assert len(evals) == 3
    for e in evals:
        key = FCNetFixedFidelityTabularBenchmark._lut_key(e.configuration)
        assert e.objectives["valid_loss"] == pytest.approx(expected[key])


# ---------------------------------------------------------------------------
# PD1: tiny pickle dataframe
# ---------------------------------------------------------------------------

PD1_TASKS = ["cifar10,cifar,wrn,wrn26,256", "mnist,mnist,cnn,cnn3,64",
             "lm1b,lm1b,transformer,tfm,512", "svhn,svhn,wrn,wrn26,128"]
PD1_EXCLUDED = "imagenet_resnet50,imagenet,resnet,resnet50,1024"


@pytest.fixture
def pd1_file(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    for t, task in enumerate(PD1_TASKS + [PD1_EXCLUDED]):
        for i in range(12):
            rows.append({
                "study_group": task,
                "hps.lr_hparams.decay_steps_factor": rng.uniform(0.01, 0.99),
                "hps.lr_hparams.initial_value": rng.uniform(np.log(1e-5),
                                                            np.log(10)),
                "hps.lr_hparams.power": rng.uniform(0.1, 2.0),
                "hps.opt_hparams.momentum": rng.uniform(np.log(1e-3), 0.0),
                "best_valid/error_rate": float(
                    0.05 + 0.9 * rng.uniform() + 0.01 * t),
            })
    path = tmp_path / "pd1.pickle"
    pd.DataFrame(rows).to_pickle(path)
    return str(path)


def test_pd1_missing_blob_raises(tmp_path):
    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1

    with pytest.raises(FileNotFoundError):
        PD1(n_data_per_task=[4], data_file=str(tmp_path / "nope.pickle"))


def test_pd1_nearest_neighbor_lookup(pd1_file):
    import pandas as pd

    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1

    b = PD1(n_data_per_task=[4, 4], seed=0, data_file=pd1_file)
    df = pd.read_pickle(pd1_file)
    task_df = df[df["study_group"] == b.target_task.uid]
    row = task_df.iloc[3]
    exact = {
        "decay_steps_factor": row["hps.lr_hparams.decay_steps_factor"],
        "initial_value": row["hps.lr_hparams.initial_value"],
        "power": row["hps.lr_hparams.power"],
        "momentum": row["hps.opt_hparams.momentum"],
    }
    ev = b(EvaluationSpecification(configuration=exact))
    assert ev.objectives["best_valid/error_rate"] == pytest.approx(
        row["best_valid/error_rate"])
    # a small perturbation snaps to the same nearest row
    perturbed = {k: v + 1e-6 for k, v in exact.items()}
    ev2 = b(EvaluationSpecification(configuration=perturbed))
    assert ev2.objectives == ev.objectives


def test_pd1_task_selection_seeded_and_excludes_imagenet(pd1_file):
    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1

    uids = set()
    for seed in range(6):
        b1 = PD1(n_data_per_task=[4, 4], seed=seed, data_file=pd1_file)
        b2 = PD1(n_data_per_task=[4, 4], seed=seed, data_file=pd1_file)
        assert b1.target_task.uid == b2.target_task.uid
        assert list(b1.meta_tasks) == list(b2.meta_tasks)
        assert b1.target_task.uid != PD1_EXCLUDED
        assert PD1_EXCLUDED not in b1.meta_tasks
        assert b1.target_task.uid not in b1.meta_tasks
        uids.add(b1.target_task.uid)
    assert len(uids) > 1  # different seeds explore different targets
    with pytest.raises(ValueError):
        PD1(n_data_per_task=[4], seed=0, data_file=pd1_file,
            target_task_id="not-a-task")


def test_pd1_optimum_is_table_minimum(pd1_file):
    import pandas as pd

    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1

    b = PD1(n_data_per_task=[4], seed=1, data_file=pd1_file)
    df = pd.read_pickle(pd1_file)
    expected = df[df["study_group"] == b.target_task.uid][
        "best_valid/error_rate"].min()
    assert b.optimum == pytest.approx(expected)


def test_pd1_meta_data_counts_and_values_from_table(pd1_file):
    import pandas as pd

    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1

    b = PD1(n_data_per_task=[5, 3], seed=2, data_file=pd1_file)
    md = b.get_meta_data()
    assert [len(v) for v in md.values()] == [5, 3]
    df = pd.read_pickle(pd1_file)
    for uid, evals in md.items():
        vals = set(df[df["study_group"] == uid]["best_valid/error_rate"])
        for e in evals:
            assert e.objectives["best_valid/error_rate"] in vals
            assert set(e.configuration) == {"decay_steps_factor",
                                            "initial_value", "power",
                                            "momentum"}
    with pytest.raises(NotImplementedError):
        b.get_meta_data(distribution="sobol")


def test_pd1_scamlgp_bo_study(pd1_file):
    from scamlgp_tpu.benchmarking.bbo_helper import run_with_bbo
    from scamlgp_tpu.benchmarking.benchmarks.pd1 import PD1
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO

    b = PD1(n_data_per_task=[6, 6], seed=3, data_file=pd1_file)
    evals = run_with_bbo(b, ScaMLGPBO,
                         {"seed": 1, "num_fit_steps": 8,
                          "num_restarts_log_likelihood": 1},
                         max_evaluations=3, meta_data_seed=7)
    assert len(evals) == 3
    table_vals = set(
        __import__("pandas").read_pickle(pd1_file)["best_valid/error_rate"])
    for e in evals:
        assert e.objectives["best_valid/error_rate"] in table_vals


# ---------------------------------------------------------------------------
# HPOBench: in-memory hpobench + ConfigSpace stubs
# ---------------------------------------------------------------------------

class _HP:
    def __init__(self, name):
        self.name = name


class _UniformFloat(_HP):
    def __init__(self, name, lower, upper, log=False):
        super().__init__(name)
        self.lower, self.upper, self.log = lower, upper, log


class _UniformInteger(_HP):
    def __init__(self, name, lower, upper, log=False):
        super().__init__(name)
        self.lower, self.upper, self.log = lower, upper, log


class _Ordinal(_HP):
    def __init__(self, name, sequence):
        super().__init__(name)
        self.sequence = tuple(sequence)


class _Categorical(_HP):
    def __init__(self, name, choices):
        super().__init__(name)
        self.choices = tuple(choices)


class _Constant(_HP):
    def __init__(self, name, value):
        super().__init__(name)
        self.value = value


def _make_cs_module():
    mod = types.ModuleType("ConfigSpace")
    mod.UniformFloatHyperparameter = _UniformFloat
    mod.UniformIntegerHyperparameter = _UniformInteger
    mod.OrdinalHyperparameter = _Ordinal
    mod.CategoricalHyperparameter = _Categorical
    mod.Constant = _Constant
    return mod


class _FakeConfigSpace:
    def __init__(self, hps):
        self._hps = list(hps)

    def values(self):
        return list(self._hps)


class _FakeFidelitySpace:
    def get_default_configuration(self):
        return {"subsample": 1.0}


SVM_GAMMAS = (0.1, 1.0, 10.0)
SVM_CS = (0.25, 1.0, 4.0)


def _fake_fn(task_id, C, gamma, subsample=1.0, seed=0):
    t = (int(task_id) % 7) / 7.0
    return float(0.2 + 0.1 * np.sin(np.log(C) + t) + 0.01 * gamma
                 + 0.05 * (1.0 - subsample) + 0.003 * seed)


class FakeTabularBenchmark:
    """Shape-compatible stand-in for hpobench's ML ``TabularBenchmark``."""

    def __init__(self, model, task_id, data_dir=None, rng=None):
        self.model, self.task_id = model, str(task_id)

    def get_configuration_space(self):
        return _FakeConfigSpace([
            _UniformFloat("C", 2.0 ** -5, 2.0 ** 5, log=True),
            _Ordinal("gamma", SVM_GAMMAS),
        ])

    def get_fidelity_space(self):
        return _FakeFidelitySpace()

    @property
    def table(self):
        import pandas as pd

        rows = []
        for C, g, sub, seed in itertools.product(SVM_CS, SVM_GAMMAS,
                                                 (0.1, 1.0), (0, 1)):
            rows.append({"subsample": sub, "C": C, "gamma": g, "seed": seed,
                         "result": {"function_value":
                                    _fake_fn(self.task_id, C, g, sub, seed)}})
        return pd.DataFrame(rows)

    def __call__(self, configuration, fidelity=None):
        sub = (fidelity or {"subsample": 1.0})["subsample"]
        return _fake_fn(self.task_id, configuration["C"],
                        configuration["gamma"], sub)


@pytest.fixture
def hpobench_stub(monkeypatch):
    monkeypatch.setitem(sys.modules, "ConfigSpace", _make_cs_module())
    for name in ("hpobench", "hpobench.benchmarks", "hpobench.benchmarks.ml"):
        monkeypatch.setitem(sys.modules, name, types.ModuleType(name))
    tab = types.ModuleType("hpobench.benchmarks.ml.tabular_benchmark")
    tab.TabularBenchmark = FakeTabularBenchmark
    monkeypatch.setitem(sys.modules,
                        "hpobench.benchmarks.ml.tabular_benchmark", tab)


def test_space_from_configspace_bridge(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        space_from_configspace,
    )

    cs = _FakeConfigSpace([
        _UniformFloat("lr", 1e-5, 1.0, log=True),
        _UniformFloat("momentum", 0.0, 0.99),
        _UniformInteger("depth", 1, 10),
        _Ordinal("width", (16, 32, 64)),
        _Categorical("activation", ("relu", "tanh")),
        _Constant("booster", "gbtree"),
    ])
    space = space_from_configspace(cs)
    # the constant is fixed, hence excluded from the numerical encoding
    assert len(space) == 5
    assert space.fixed == {"booster": "gbtree"}
    for _ in range(10):
        config = space.sample()
        assert 1e-5 <= config["lr"] <= 1.0
        assert config["depth"] in range(1, 11)
        assert config["width"] in (16, 32, 64)
        assert config["activation"] in ("relu", "tanh")
        assert config["booster"] == "gbtree"
        vec = space.to_numerical(config)
        assert vec.shape == (5,)
        assert space.from_numerical(vec) == pytest.approx(config)


def test_hpobench_validates_scenario_and_task(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        HPOBenchTabular,
    )

    with pytest.raises(ValueError):
        HPOBenchTabular(scenario="not-a-scenario")
    with pytest.raises(ValueError):
        HPOBenchTabular(scenario="svm", target_task_id="999999999")


def test_hpobench_seeded_task_selection(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        TASK_IDS,
        HPOBenchTabular,
    )

    b1 = HPOBenchTabular(scenario="svm", n_data_per_task=[4, 4], seed=9)
    b2 = HPOBenchTabular(scenario="svm", n_data_per_task=[4, 4], seed=9)
    assert b1.target_task.uid == b2.target_task.uid
    assert list(b1.meta_tasks) == list(b2.meta_tasks)
    assert b1.target_task.uid in TASK_IDS["svm"]
    assert b1.target_task.uid not in b1.meta_tasks
    assert len(b1.meta_tasks) == 2


def test_hpobench_call_is_deterministic_lookup(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        HPOBenchTabular,
    )

    b = HPOBenchTabular(scenario="svm", n_data_per_task=[4], seed=0,
                        target_task_id="3")
    config = {"C": 1.0, "gamma": 0.1}
    ev = b(EvaluationSpecification(configuration=config))
    assert ev.objectives["1 - Accuracy"] == pytest.approx(
        _fake_fn("3", 1.0, 0.1, 1.0))
    with pytest.raises(ValueError):
        b(EvaluationSpecification(configuration=config), task_uid="bogus")


def test_hpobench_optimum_from_table_mean_over_seeds(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        HPOBenchTabular,
    )

    b = HPOBenchTabular(scenario="svm", n_data_per_task=[4], seed=0,
                        target_task_id="31")
    expected = min(
        np.mean([_fake_fn("31", C, g, 1.0, s) for s in (0, 1)])
        for C in SVM_CS for g in SVM_GAMMAS)
    assert b.optimum == pytest.approx(expected)


def test_hpobench_meta_data_random_and_sobol(hpobench_stub):
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        HPOBenchTabular,
    )

    b = HPOBenchTabular(scenario="lr", n_data_per_task=[5, 3], seed=4)
    md_r = b.get_meta_data(seed=11, distribution="random")
    md_r2 = b.get_meta_data(seed=11, distribution="random")
    assert [len(v) for v in md_r.values()] == [5, 3]
    for uid in md_r:
        assert [e.configuration for e in md_r[uid]] == \
               [e.configuration for e in md_r2[uid]]
        for e in md_r[uid]:
            assert e.objectives["1 - Accuracy"] == pytest.approx(
                _fake_fn(uid, e.configuration["C"], e.configuration["gamma"]))
    md_s = b.get_meta_data(seed=11, distribution="sobol")
    assert [len(v) for v in md_s.values()] == [5, 3]
    with pytest.raises(ValueError):
        b.get_meta_data(seed=11, distribution="grid")


def test_hpobench_scamlgp_bo_study(hpobench_stub):
    from scamlgp_tpu.benchmarking.bbo_helper import run_with_bbo
    from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import (
        HPOBenchTabular,
    )
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO

    b = HPOBenchTabular(scenario="nn", n_data_per_task=[6, 6], seed=5)
    evals = run_with_bbo(b, ScaMLGPBO,
                         {"seed": 1, "num_fit_steps": 8,
                          "num_restarts_log_likelihood": 1},
                         max_evaluations=3, meta_data_seed=7)
    assert len(evals) == 3
    for e in evals:
        assert e.objectives["1 - Accuracy"] == pytest.approx(
            _fake_fn(b.target_task.uid, e.configuration["C"],
                     e.configuration["gamma"]))
