def legendre_symbol(a: int, p: int) -> int:
    """Euler's criterion, plain-int result (p an odd prime)."""
    r = pow(a % p, (p - 1) // 2, p)
    if r == 0:
        return 0
    return 1 if r == 1 else -1
