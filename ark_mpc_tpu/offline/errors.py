"""Offline-phase errors (`offline-phase/src/error.rs:6-23`)."""


class LowGearError(Exception):
    """Base offline-phase error."""


class InvalidMac(LowGearError):
    """MAC check failed during offline generation."""


class InvalidCommitment(LowGearError):
    """A commit-reveal opening failed to verify."""


class SacrificeError(LowGearError):
    """Triple sacrifice check failed (malicious triple)."""


class KeyExchangeError(LowGearError):
    """BGV key exchange / proof verification failed."""


class NotSetup(LowGearError):
    """Offline phase used before setup completed."""
