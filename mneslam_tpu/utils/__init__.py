"""Utilities: visualization, structured metrics/timers."""
