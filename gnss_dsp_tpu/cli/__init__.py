"""Argv-compatible CLI front doors.

The reference ships 65 clone scripts; here two dispatchers (acquire,
track) plus the standalone utilities (cn0, spectrum, squaring) regenerate
every script's behavior from the signal registry.  scripts/ holds thin
drop-in wrappers with the reference's exact file names.
"""
