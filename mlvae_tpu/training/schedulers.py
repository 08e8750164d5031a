"""LR schedulers (YAML alias of ``speechbrain.nnet.schedulers.NewBobScheduler``
used by the CTC recipes, reference ``models/CRDNN_CTC/model.yaml:50-54``).

NewBob: anneal the LR by ``annealing_factor`` whenever the relative
improvement of the tracked metric falls below ``improvement_threshold``,
with ``patient`` grace evaluations.
"""
from __future__ import annotations


class NewBobScheduler:
    def __init__(self, initial_value: float,
                 improvement_threshold: float = 0.0025,
                 annealing_factor: float = 0.5, patient: int = 0):
        self.hyperparam_value = float(initial_value)
        self.improvement_threshold = improvement_threshold
        self.annealing_factor = annealing_factor
        self.patient = patient
        self.metric_values = []
        self.current_patient = patient

    def __call__(self, metric_value: float):
        old_value = new_value = self.hyperparam_value
        if self.metric_values:
            prev = self.metric_values[-1]
            if prev == 0:
                improvement = 0.0
            else:
                improvement = (prev - metric_value) / prev
            if improvement < self.improvement_threshold:
                if self.current_patient == 0:
                    new_value = old_value * self.annealing_factor
                    self.current_patient = self.patient
                else:
                    self.current_patient -= 1
        self.metric_values.append(metric_value)
        self.hyperparam_value = new_value
        return old_value, new_value

    # -- checkpoint protocol ---------------------------------------------------
    def state_dict(self):
        return {
            "hyperparam_value": self.hyperparam_value,
            "metric_values": list(self.metric_values),
            "current_patient": self.current_patient,
        }

    def load_state_dict(self, state):
        self.hyperparam_value = state["hyperparam_value"]
        self.metric_values = list(state["metric_values"])
        self.current_patient = state["current_patient"]
