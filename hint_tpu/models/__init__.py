from hint_tpu.models.flow import Flow, TwoLaneFlow
from hint_tpu.models import builders

__all__ = ["Flow", "TwoLaneFlow", "builders"]
