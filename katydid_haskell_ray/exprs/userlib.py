"""The reference's example user-defined function library, ported.

/root/reference/test/UserDefinedFuncs.hs:17-77 ships three example UDFs
through the MkFunc extension surface: ``inc`` (int -> int, the only
non-bool-returning UDF in the reference suite — proves typed composition
inside larger expressions), ``concat`` (string x string -> string) and
``isPrime`` (int -> bool).

The registry is PER-PROCESS state: call :func:`ensure_userlib` inside the
map function (each Ray worker process), not on the driver.
"""

from __future__ import annotations

import numpy as np

from katydid_haskell_ray.exprs import core as E


def ensure_userlib() -> None:
    """Register inc/concat/isPrime (idempotent)."""
    if "inc" not in E.UDFS:
        def mk_inc(args):
            if len(args) != 1 or args[0].vtype != "int":
                raise E.BuildError("inc: wants one int arg")
            return E._mk_plain("inc", "int", args)

        def inc_scalar(a):
            return E.ERR if E.is_err(a) else a + 1

        def inc_vector(n, a):
            va, ea = a
            va = np.broadcast_to(np.asarray(va, dtype=np.int64), (n,))
            return va + 1, ea

        E.register_udf("inc", mk_inc, inc_scalar, inc_vector)

    if "concat" not in E.UDFS:
        def mk_concat(args):
            if len(args) != 2 or any(a.vtype != "string" for a in args):
                raise E.BuildError("concat: wants two string args")
            return E._mk_plain("concat", "string", args)

        def concat_scalar(a, b):
            if E.is_err(a) or E.is_err(b):
                return E.ERR
            return a + b

        E.register_udf("concat", mk_concat, concat_scalar)

    if "isPrime" not in E.UDFS:
        def mk_prime(args):
            if len(args) != 1 or args[0].vtype != "int":
                raise E.BuildError("isPrime: wants one int arg")
            return E._mk_plain("isPrime", "bool", args)

        def prime_scalar(a):
            if E.is_err(a):
                return E.ERR
            if a < 2:
                return False
            return all(a % d for d in range(2, int(a ** 0.5) + 1))

        def prime_vector(n, a):
            va, ea = a
            va = np.broadcast_to(np.asarray(va, dtype=np.int64), (n,))
            if (va >= 121).any():  # trial division only exhaustive below 121
                return E._vector_via_scalar(E.UDFS["isPrime"], n, [a], "bool")
            out = np.ones(n, dtype=bool)
            out[va < 2] = False
            for d in (2, 3, 5, 7):
                out &= (va == d) | (va % d != 0) | (va < 2)
            if ea is not None:
                out &= ~ea
            return out, ea

        E.register_udf("isPrime", mk_prime, prime_scalar, prime_vector)
