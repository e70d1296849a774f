from hint_tpu.monitor.console import ConsoleMonitor, NullMonitor, make_monitor

__all__ = ["ConsoleMonitor", "NullMonitor", "make_monitor"]
