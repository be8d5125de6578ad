"""Pure-Python stand-in for numba so the reference implementation can
run in this image (numba is not installed). ``njit``/``jit`` become
identity decorators: the kernels execute as plain Python — slower, but
numerically identical, which is all the head-to-head baseline needs."""


def njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn

    return wrap


jit = njit


def prange(*args):
    return range(*args)
