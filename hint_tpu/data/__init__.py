from hint_tpu.data.fourier import FourierCurveModel, LensShapeModel, PlusShapeModel
from hint_tpu.data.uci import Power, Gas, Miniboone
from hint_tpu.data.loaders import prepare_toy_data, prepare_uci_data

__all__ = [
    "FourierCurveModel",
    "LensShapeModel",
    "PlusShapeModel",
    "Power",
    "Gas",
    "Miniboone",
    "prepare_toy_data",
    "prepare_uci_data",
]
