"""Test-only stand-in for the single sympy symbol the reference imports
(`from sympy.ntheory import legendre_symbol`, gnsstools/gps/l1cd.py:6).

Modern sympy (>= 1.13) returns sympy Integer objects from
legendre_symbol; the reference builds `np.array([legendre_symbol(i, N)
...])` from them (l1cd.py:68), which yields an OBJECT-dtype array whose
sympy scalars then flow through the pure-python `correlate` loop into
`discriminator.fll_atan` and crash (`'Zero' object has no attribute
'arctan'`).  With the sympy the reference was written against, the
values were plain ints.  This shim restores that contract for the
parity subprocesses — same mathematical values, int dtype."""
