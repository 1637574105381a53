"""Observable estimation: the experiment data model, TPB grouping, acquisition.

Reference parity: forest/benchmarking/observable_estimation.py — _OneQState:37,
TensorProductState:78, state ctors:131-172, ExperimentSetting:176,
ObservablesExperiment:234, JSON io:356-389, preps:392-467, TPB grouping:470-691,
ExperimentResult:695, generate_experiment_programs:736, shots_to_obs_moments:804,
estimate_observables:856, get_calibration_program:927,
calibrate_observable_estimates:964, ratio_variance:1052,
merge_disjoint_experiments:1093, get_results_by_qubit_groups:1145.

TPU-first notes: this layer is deliberately host-side Python (tiny metadata
work); it compiles settings into circuits executed by the in-process JAX QVM
(forest_benchmarking_tpu.sim) instead of shipping Quil over RPC. The batched
array bridge for estimators lives in the tomography module.
"""
from __future__ import annotations

import itertools
import json
import re
import warnings
from dataclasses import dataclass
from json import JSONEncoder
from math import pi
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np
from scipy.stats import beta as beta_dist

from forest_benchmarking_tpu.circuits import Circuit, Gate, RX, RY, RZ
from forest_benchmarking_tpu.paulis import PauliTerm
from forest_benchmarking_tpu.utils import transform_bit_moments_to_pauli

__all__ = [
    "_OneQState", "TensorProductState", "SIC0", "SIC1", "SIC2", "SIC3",
    "plusX", "minusX", "plusY", "minusY", "plusZ", "minusZ", "zeros_state",
    "ExperimentSetting", "ObservablesExperiment", "OperatorEncoder",
    "to_json", "read_json", "ExperimentResult",
    "construct_tpb_graph", "group_settings_clique_removal",
    "group_settings_greedy", "group_settings",
    "generate_experiment_programs", "shots_to_obs_moments",
    "estimate_observables", "get_calibration_program",
    "calibrate_observable_estimates", "ratio_variance",
    "merge_disjoint_experiments", "get_results_by_qubit_groups",
]


@dataclass(frozen=True)
class _OneQState:
    """A named one-qubit state: label in {SIC, X, Y, Z}, index, qubit."""
    label: str
    index: int
    qubit: int

    def __str__(self):
        if self.label in ["X", "Y", "Z"]:
            eigen_state = "+" if self.index == 0 else "-"
            return f"{self.label}{eigen_state}_{self.qubit}"
        return f"{self.label}{self.index}_{self.qubit}"

    @classmethod
    def from_str(cls, s: str) -> "_OneQState":
        ma = re.match(r"\s*(\w+)([\d+-])_(\d+)\s*", s)
        if ma is None:
            raise ValueError(f"Couldn't parse '{s}'")
        index = ma.group(2)
        index = {"+": 0, "-": 1}.get(index, None) if index in "+-" else int(index)
        return _OneQState(label=ma.group(1), index=index, qubit=int(ma.group(3)))


@dataclass(frozen=True)
class TensorProductState:
    """A tensor product of named one-qubit states."""
    states: Tuple[_OneQState, ...]

    def __init__(self, states=None):
        object.__setattr__(self, "states", tuple(states) if states else tuple())

    def __mul__(self, other: "TensorProductState") -> "TensorProductState":
        return TensorProductState(self.states + other.states)

    def __str__(self):
        return " * ".join(str(s) for s in self.states)

    def __repr__(self):
        return f"TensorProductState[{self}]"

    def __getitem__(self, qubit: int) -> _OneQState:
        for s in self.states:
            if s.qubit == qubit:
                return s
        raise IndexError()

    def __iter__(self):
        yield from self.states

    def __len__(self):
        return len(self.states)

    def states_as_set(self):
        return frozenset(self.states)

    def __eq__(self, other):
        if not isinstance(other, TensorProductState):
            return False
        return self.states_as_set() == other.states_as_set()

    def __hash__(self):
        return hash(self.states_as_set())

    @classmethod
    def from_str(cls, s: str) -> "TensorProductState":
        if s == "":
            return TensorProductState()
        return TensorProductState(tuple(_OneQState.from_str(x) for x in s.split("*")))


def SIC0(q):  # noqa: N802
    return TensorProductState((_OneQState("SIC", 0, q),))


def SIC1(q):  # noqa: N802
    return TensorProductState((_OneQState("SIC", 1, q),))


def SIC2(q):  # noqa: N802
    return TensorProductState((_OneQState("SIC", 2, q),))


def SIC3(q):  # noqa: N802
    return TensorProductState((_OneQState("SIC", 3, q),))


def plusX(q):  # noqa: N802
    return TensorProductState((_OneQState("X", 0, q),))


def minusX(q):  # noqa: N802
    return TensorProductState((_OneQState("X", 1, q),))


def plusY(q):  # noqa: N802
    return TensorProductState((_OneQState("Y", 0, q),))


def minusY(q):  # noqa: N802
    return TensorProductState((_OneQState("Y", 1, q),))


def plusZ(q):  # noqa: N802
    return TensorProductState((_OneQState("Z", 0, q),))


def minusZ(q):  # noqa: N802
    return TensorProductState((_OneQState("Z", 1, q),))


def zeros_state(qubits: Iterable[int]) -> TensorProductState:
    return TensorProductState(_OneQState("Z", 0, q) for q in qubits)


@dataclass(frozen=True, init=False)
class ExperimentSetting:
    """One (prepare in_state, measure observable) pair."""
    in_state: TensorProductState
    observable: PauliTerm

    def __init__(self, in_state: TensorProductState, observable: PauliTerm):
        object.__setattr__(self, "in_state", in_state)
        object.__setattr__(self, "observable", observable)

    def __str__(self):
        return f"{self.in_state}→{self.observable.compact_str()}"

    def __repr__(self):
        return f"ExperimentSetting[{self}]"

    def serializable(self):
        return str(self)

    @classmethod
    def from_str(cls, s: str) -> "ExperimentSetting":
        instr, outstr = s.split("→")
        return ExperimentSetting(in_state=TensorProductState.from_str(instr),
                                 observable=PauliTerm.from_compact_str(outstr))


class ObservablesExperiment:
    """Settings (grouped into simultaneously-estimable lists) + a core circuit."""

    def __init__(self,
                 settings: Union[List[ExperimentSetting], List[List[ExperimentSetting]]],
                 program: Circuit):
        if len(settings) > 0 and isinstance(settings[0], ExperimentSetting):
            settings = [[s] for s in settings]
        self._settings: List[List[ExperimentSetting]] = settings or []
        self.program = program

    def __len__(self):
        return len(self._settings)

    def __getitem__(self, item):
        return self._settings[item]

    def __setitem__(self, key, value):
        self._settings[key] = value

    def __delitem__(self, key):
        del self._settings[key]

    def __iter__(self):
        yield from self._settings

    def append(self, expts):
        if not isinstance(expts, list):
            expts = [expts]
        self._settings.append(expts)

    def extend(self, expts):
        self._settings.extend(expts)

    def setting_strings(self):
        yield from (f"{i}: " + ", ".join(str(s) for s in settings)
                    for i, settings in enumerate(self._settings))

    def settings_string(self, abbrev_after: Optional[int] = None):
        strs = list(self.setting_strings())
        if abbrev_after is not None and len(strs) > abbrev_after:
            first_n = abbrev_after // 2
            last_n = abbrev_after - first_n
            excluded = len(strs) - abbrev_after
            strs = strs[:first_n] + [f"... {excluded} not shown ..."] + strs[-last_n:]
        return "\n".join(strs)

    def __str__(self):
        return str(self.program) + "\n" + self.settings_string(abbrev_after=20)

    def __repr__(self):
        return f"ObservablesExperiment[{len(self)} groups]"

    def serializable(self):
        return {
            "type": "ObservablesExperiment",
            "settings": [[s.serializable() for s in group] for group in self._settings],
            "program": self.program.out(),
        }

    def __eq__(self, other):
        if not isinstance(other, ObservablesExperiment):
            return False
        return self.serializable() == other.serializable()


class OperatorEncoder(JSONEncoder):
    def default(self, o):
        if isinstance(o, (ExperimentSetting, ObservablesExperiment, ExperimentResult)):
            return o.serializable()
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        return o


def to_json(fn: str, obj) -> str:
    """Save experiments/results as JSON (reference observable_estimation.py:367)."""
    with open(fn, "w") as f:
        json.dump(obj, f, cls=OperatorEncoder, indent=2, ensure_ascii=False)
    return fn


def _parse_circuit(text: str) -> Circuit:
    """Parse the simple textual gate form produced by Circuit.out()."""
    gates = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        dagger = line.startswith("DAGGER ")
        if dagger:
            line = line[len("DAGGER "):]
        m = re.match(r"(\w+)(?:\(([^)]*)\))?((?:\s+\d+)+)$", line)
        if m is None:
            raise ValueError(f"Couldn't parse gate line '{line}'")
        name = m.group(1)
        params = tuple(float(x) for x in m.group(2).split(",")) if m.group(2) else ()
        qubits = tuple(int(x) for x in m.group(3).split())
        gates.append(Gate(name, params, qubits, dagger=dagger))
    return Circuit(gates)


def _operator_object_hook(obj):
    if obj.get("type") == "ObservablesExperiment":
        return ObservablesExperiment(
            [[ExperimentSetting.from_str(s) for s in settings]
             for settings in obj["settings"]],
            program=_parse_circuit(obj["program"]))
    return obj


def read_json(fn: str):
    with open(fn) as f:
        return json.load(f, object_hook=_operator_object_hook)


# ----------------------------- state preps ---------------------------------

def _one_q_sic_prep(index: int, qubit: int) -> Circuit:
    """Prepare the index-th SIC basis state (reference :392)."""
    if index == 0:
        return Circuit()
    theta = 2 * np.arccos(1 / np.sqrt(3))
    zx_plane_rotation = Circuit([RX(-pi / 2, qubit), RZ(theta - pi, qubit),
                                 RX(-pi / 2, qubit)])
    if index == 1:
        return zx_plane_rotation
    if index == 2:
        return zx_plane_rotation + RZ(-2 * pi / 3, qubit)
    if index == 3:
        return zx_plane_rotation + RZ(2 * pi / 3, qubit)
    raise ValueError(f"Bad SIC index: {index}")


def _one_q_pauli_prep(label: str, index: int, qubit: int) -> Circuit:
    """Prepare the index-th eigenstate of the Pauli given by label (:416)."""
    if index not in [0, 1]:
        raise ValueError(f"Bad Pauli index: {index}")
    if label == "X":
        return Circuit([RY(pi / 2 if index == 0 else -pi / 2, qubit)])
    if label == "Y":
        return Circuit([RX(-pi / 2 if index == 0 else pi / 2, qubit)])
    if label == "Z":
        return Circuit() if index == 0 else Circuit([RX(pi, qubit)])
    raise ValueError(f"Bad Pauli label: {label}")


def _one_q_state_prep(oneq_state: _OneQState) -> Circuit:
    label = oneq_state.label
    if label == "SIC":
        return _one_q_sic_prep(oneq_state.index, oneq_state.qubit)
    if label in ["X", "Y", "Z"]:
        return _one_q_pauli_prep(label, oneq_state.index, oneq_state.qubit)
    raise ValueError(f"Bad state label: {label}")


def _local_pauli_eig_meas(op: str, idx: int) -> Circuit:
    """Rotate the Pauli eigenbasis onto the Z measurement basis (:455)."""
    if op == "X":
        return Circuit([RY(-pi / 2, idx)])
    if op == "Y":
        return Circuit([RX(pi / 2, idx)])
    if op == "Z":
        return Circuit()
    raise ValueError(f"Unknown operation {op}")


# ------------------------------ TPB grouping --------------------------------

def _max_weight_operator(ops: Iterable[PauliTerm]) -> Optional[PauliTerm]:
    """Merge operators sharing a tensor product basis; None if incompatible."""
    mapping: Dict[int, str] = {}
    for op in ops:
        for idx, op_str in op:
            if idx in mapping:
                if mapping[idx] != op_str:
                    return None
            else:
                mapping[idx] = op_str
    return PauliTerm(mapping)


def _max_weight_state(states: Iterable[TensorProductState]) -> Optional[TensorProductState]:
    """Merge compatible tensor product states; None if incompatible."""
    mapping: Dict[int, _OneQState] = {}
    for state in states:
        for oneq in state.states:
            if oneq.qubit in mapping:
                if mapping[oneq.qubit] != oneq:
                    return None
            else:
                mapping[oneq.qubit] = oneq
    return TensorProductState(list(mapping.values()))


def construct_tpb_graph(obs_expt: ObservablesExperiment):
    """Graph with an edge when two settings are diagonal in a shared TPB."""
    import networkx as nx
    g = nx.Graph()
    for groups in obs_expt:
        assert len(groups) == 1, "already grouped?"
        setting = groups[0]
        if setting not in g:
            g.add_node(setting, count=1)
        else:
            g.nodes[setting]["count"] += 1
    for group1, group2 in itertools.combinations(obs_expt, r=2):
        sett1, sett2 = group1[0], group2[0]
        if sett1 == sett2:
            continue
        if (_max_weight_state([sett1.in_state, sett2.in_state]) is not None
                and _max_weight_operator([sett1.observable, sett2.observable])
                is not None):
            g.add_edge(sett1, sett2)
    return g


def group_settings_clique_removal(experiment: ObservablesExperiment) -> ObservablesExperiment:
    """Group via max-clique removal on the TPB compatibility graph."""
    from networkx.algorithms.approximation.clique import clique_removal
    g = construct_tpb_graph(experiment)
    _, cliqs = clique_removal(g)
    new_cliqs = []
    for cliq in cliqs:
        new_cliq = []
        for sett in cliq:
            new_cliq += [sett] * g.nodes[sett]["count"]
        new_cliqs.append(new_cliq)
    return ObservablesExperiment(new_cliqs, program=experiment.program)


def _max_tpb_overlap(obs_expt: ObservablesExperiment):
    """Greedy assignment of settings to shared-TPB buckets (reference :564)."""
    diagonal_sets = {}
    for group in obs_expt:
        assert len(group) == 1, "already grouped?"
        setting = group[0]
        found = False
        for es in list(diagonal_sets):
            trial = diagonal_sets[es] + [setting]
            diag_in = _max_weight_state(s.in_state for s in trial)
            diag_out = _max_weight_operator(s.observable for s in trial)
            if diag_in is not None and diag_out is not None:
                found = True
                if (len(diag_in) > len(es.in_state)
                        or len(diag_out) > len(es.observable)):
                    del diagonal_sets[es]
                    diagonal_sets[ExperimentSetting(diag_in, diag_out)] = trial
                else:
                    diagonal_sets[es] = trial
                break
        if not found:
            diagonal_sets[setting] = [setting]
    return diagonal_sets


def group_settings_greedy(obs_expt: ObservablesExperiment) -> ObservablesExperiment:
    return ObservablesExperiment(list(_max_tpb_overlap(obs_expt).values()),
                                 program=obs_expt.program)


def group_settings(obs_expt: ObservablesExperiment,
                   method: str = "greedy") -> ObservablesExperiment:
    """Group settings diagonal in a shared TPB (reference :629)."""
    allowed = ["greedy", "clique-removal"]
    assert method in allowed, f"'method' should be one of {allowed}."
    if method == "greedy":
        return group_settings_greedy(obs_expt)
    return group_settings_clique_removal(obs_expt)


# ------------------------------- results ------------------------------------

@dataclass(frozen=True)
class ExperimentResult:
    """Expectation +- std_err for one setting, with calibration fields."""
    setting: ExperimentSetting
    expectation: Union[float, complex]
    total_counts: int
    std_err: Union[float, complex] = None
    raw_expectation: Union[float, complex] = None
    raw_std_err: float = None
    calibration_expectation: Union[float, complex] = None
    calibration_std_err: Union[float, complex] = None
    calibration_counts: int = None

    def __str__(self):
        return f"{self.setting}: {self.expectation} +- {self.std_err}"

    def __repr__(self):
        return f"ExperimentResult[{self}]"

    def serializable(self):
        return {
            "type": "ExperimentResult",
            "setting": str(self.setting),
            "expectation": self.expectation,
            "std_err": self.std_err,
            "total_counts": self.total_counts,
            "raw_expectation": self.raw_expectation,
            "raw_std_err": self.raw_std_err,
            "calibration_expectation": self.calibration_expectation,
            "calibration_std_err": self.calibration_std_err,
            "calibration_counts": self.calibration_counts,
        }


# ------------------------------ acquisition ---------------------------------

def generate_experiment_programs(obs_expt: ObservablesExperiment,
                                 active_reset: bool = False,
                                 use_basic_compile: bool = True) \
        -> Tuple[List[Circuit], List[List[int]]]:
    """Build the circuit for each grouped setting (prep + core + meas rotation).

    ``active_reset`` is accepted for API parity; the in-process simulator always
    starts from |0..0> so it is a no-op.
    """
    from forest_benchmarking_tpu.compilation import basic_compile
    programs = []
    meas_qubits = []
    for settings in obs_expt:
        total = Circuit()
        max_weight_in = _max_weight_state(s.in_state for s in settings)
        if max_weight_in is None:
            raise ValueError("Input states are not compatible. Re-group the "
                             "experiment settings so that groups of parallel "
                             "settings have compatible input states.")
        for oneq_state in max_weight_in.states:
            total += _one_q_state_prep(oneq_state)
        total += obs_expt.program
        max_weight_out = _max_weight_operator(s.observable for s in settings)
        if max_weight_out is None:
            raise ValueError("Observables not compatible. Re-group the "
                             "experiment settings so that groups of parallel "
                             "settings have compatible observables.")
        for qubit, op_str in max_weight_out:
            total += _local_pauli_eig_meas(op_str, qubit)
        programs.append(basic_compile(total) if use_basic_compile else total)
        meas_qubits.append(max_weight_out.get_qubits())
    return programs, meas_qubits


def shots_to_obs_moments(bitarray: np.ndarray, qubits: List[int],
                         observable: PauliTerm,
                         use_beta_dist_unbiased_prior: bool = False) \
        -> Tuple[float, float]:
    """Mean and variance of the observable from a (shots, len(qubits)) bit array."""
    coeff = complex(observable.coefficient)
    if not np.isclose(coeff.imag, 0):
        raise ValueError("The coefficient of an observable should not be complex.")
    coeff = coeff.real

    obs_qubits = observable.get_qubits()
    idxs = [i for i, q in enumerate(qubits) if q in obs_qubits]
    if len(idxs) == 0:  # identity term
        return coeff, 0

    assert bitarray.shape[1] == len(qubits), \
        "qubits should label each column of the bitarray"
    obs_strings = bitarray[:, idxs]
    signs = 1 - 2 * obs_strings
    obs_vals = np.prod(signs, axis=1)

    if use_beta_dist_unbiased_prior:
        plus_array = obs_vals == 1
        n_minus, n_plus = np.bincount(plus_array, minlength=2)
        bernoulli_mean = beta_dist.mean(n_plus + 1, n_minus + 1)
        bernoulli_var = beta_dist.var(n_plus + 1, n_minus + 1)
        obs_mean, obs_var = transform_bit_moments_to_pauli(bernoulli_mean,
                                                           bernoulli_var)
        obs_mean *= coeff
        obs_var *= coeff ** 2
    else:
        obs_vals = coeff * obs_vals
        obs_mean = float(np.mean(obs_vals))
        obs_var = float(np.var(obs_vals)) / len(bitarray)
    return obs_mean, obs_var


def estimate_observables(qc, obs_expt: ObservablesExperiment,
                         num_shots: int = 500, symm_type: int = 0,
                         active_reset: bool = False,
                         show_progress_bar: bool = False,
                         use_basic_compile: bool = True) \
        -> Iterable[ExperimentResult]:
    """Estimate expectation and std_err for every setting of the experiment.

    ``qc`` is a forest_benchmarking_tpu.sim.QVM (in-process; no RPC boundary).
    """
    programs, meas_qubits = generate_experiment_programs(
        obs_expt, active_reset, use_basic_compile=use_basic_compile)
    for prog, meas_qs, settings in zip(programs, meas_qubits, obs_expt):
        results = qc.run_symmetrized_readout(prog, num_shots, symm_type,
                                             meas_qs or [0])
        for setting in settings:
            obs_mean, obs_var = shots_to_obs_moments(results, meas_qs,
                                                     setting.observable)
            yield ExperimentResult(
                setting=setting,
                expectation=obs_mean,
                std_err=float(np.sqrt(obs_var)),
                total_counts=len(results),
            )


def get_calibration_program(observable: PauliTerm,
                            noisy_program: Optional[Circuit] = None,
                            active_reset: bool = False) -> Circuit:
    """Circuit preparing/measuring the +1 eigenstate of the observable (:927).

    Noise annotations (gate noise, readout confusion) are inherited from
    ``noisy_program`` — the analog of PRAGMA inheritance in the reference.
    """
    calibr = Circuit()
    if noisy_program is not None:
        calibr.gate_noise = list(noisy_program.gate_noise)
        calibr.readout_confusion = dict(noisy_program.readout_confusion)
    for q, op in observable.operations_as_set():
        calibr += _one_q_pauli_prep(label=op, index=0, qubit=q)
    for q, op in observable.operations_as_set():
        calibr += _local_pauli_eig_meas(op, q)
    return calibr


def calibrate_observable_estimates(qc, expt_results: List[ExperimentResult],
                                   num_shots: int = 500, symm_type: int = -1,
                                   noisy_program: Optional[Circuit] = None,
                                   active_reset: bool = False,
                                   show_progress_bar: bool = False) \
        -> Iterable[ExperimentResult]:
    """Scale expectations by measured +1-eigenstate calibration values (:964)."""
    observables = [res.setting.observable.copy(coefficient=1.0)
                   for res in expt_results]
    observables = list(set(observables))

    calibrations = {}
    for obs in observables:
        prog = get_calibration_program(obs, noisy_program, active_reset)
        meas_qs = obs.get_qubits()
        results = qc.run_symmetrized_readout(prog, num_shots, symm_type,
                                             meas_qs or [0])
        obs_mean, obs_var = shots_to_obs_moments(results, meas_qs, obs)
        calibrations[obs.operations_as_set()] = (obs_mean, obs_var, len(results))

    for expt_result in expt_results:
        obs = expt_result.setting.observable
        if -1 < symm_type < len(obs.get_qubits()):
            warnings.warn(f"Calibration of observable {obs} currently not "
                          f"supported since it acts on more qubits than the "
                          f"symm_type {symm_type}.")
        obs_mean, obs_var, counts = calibrations[obs.operations_as_set()]
        result_mean = expt_result.expectation
        result_var = expt_result.std_err ** 2
        corrected_mean = result_mean / obs_mean
        corrected_var = ratio_variance(result_mean, result_var, obs_mean, obs_var)
        yield ExperimentResult(
            setting=expt_result.setting,
            expectation=corrected_mean,
            std_err=float(np.sqrt(corrected_var)),
            total_counts=expt_result.total_counts,
            raw_expectation=result_mean,
            raw_std_err=expt_result.std_err,
            calibration_expectation=obs_mean,
            calibration_std_err=float(np.sqrt(obs_var)),
            calibration_counts=counts,
        )


def ratio_variance(a, var_a, b, var_b):
    r"""Var[A/B] ~ var_a / b^2 + a^2 var_b / b^4 (independent A, B; :1052)."""
    return var_a / b ** 2 + (a ** 2 * var_b) / b ** 4


def merge_disjoint_experiments(experiments: List[ObservablesExperiment],
                               group_merged_settings: bool = True) \
        -> ObservablesExperiment:
    """Merge experiments on disjoint qubit sets into one (reference :1093)."""
    used_qubits = set()
    for expt in experiments:
        if expt.program.get_qubits() & used_qubits:
            raise ValueError("Experiment programs act on some shared set of "
                             "qubits and cannot be merged unambiguously.")
        used_qubits |= expt.program.get_qubits()

    all_settings = [s for expt in experiments for group in expt for s in group]
    merged_program = Circuit()
    for expt in experiments:
        merged_program = merged_program + expt.program
    merged = ObservablesExperiment(all_settings, merged_program)
    if group_merged_settings:
        merged = group_settings(merged)
    return merged


def get_results_by_qubit_groups(results: Iterable[ExperimentResult],
                                qubit_groups: Sequence[Sequence[int]]) \
        -> Dict[Tuple[int, ...], List[ExperimentResult]]:
    """Bucket results by which qubit group their observable acts within (:1145)."""
    qubit_groups = [tuple(sorted(g)) for g in qubit_groups]
    out = {group: [] for group in qubit_groups}
    for res in results:
        res_qs = res.setting.observable.get_qubits()
        for group in qubit_groups:
            if set(res_qs).issubset(set(group)):
                out[group].append(res)
    return out
