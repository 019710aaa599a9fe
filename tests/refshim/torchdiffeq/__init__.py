"""torchdiffeq stub (flow_matching.py imports odeint but the exercised code
paths use the hand-rolled fixed-step solvers)."""


def odeint(*a, **k):
    raise RuntimeError("torchdiffeq stub: adaptive ODE solver not available in tests")
