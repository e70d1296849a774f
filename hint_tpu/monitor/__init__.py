from hint_tpu.monitor.console import ConsoleMonitor, NullMonitor, make_monitor

__all__ = ["ConsoleMonitor", "NullMonitor", "make_monitor"]
# heavier, matplotlib-backed pieces live in hint_tpu.monitor.plots
# (FileMonitor, plot_sample_curves) and hint_tpu.monitor.figures (paper
# figures) and are imported lazily by callers.
