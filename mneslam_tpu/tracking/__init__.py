"""Tracking subsystem: DROID-style recurrent tracker with dense BA."""
