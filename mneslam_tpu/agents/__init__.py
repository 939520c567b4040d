"""Multi-agent collaboration: place recognition, comms, loop closure, fusion."""
