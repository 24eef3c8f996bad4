"""Small static matrices/vectors as Python containers of traced scalars.

Inside a Pallas kernel every traced value is a vector tile; tiny (2,2)
jnp arrays there force Mosaic to pad/concatenate along 1-wide dims,
which it cannot lower (and their indexing adjoints become scatters).
``SMat``/``SVec`` keep the matrix STRUCTURE in Python and the entries as
plain scalars, so physics integrands written against the QP protocol
(indexing + elementwise arithmetic, e.g. forms.potentials.asym_damage_psi)
trace to pure elementwise graphs — differentiable with scalar-only
adjoints. Used by the lane engine's fused kernel (lane.kernels.
lane_fused_elem); integrands needing real array ops fall back to the
unfused path.
"""

from __future__ import annotations


def _binop(a, b, op):
    if isinstance(b, SMat):
        return [[op(x, y) for x, y in zip(ra, rb)]
                for ra, rb in zip(a, b.rows)]
    return [[op(x, b) for x in ra] for ra in a]


class SVec:
    __slots__ = ("items",)

    def __init__(self, items):
        self.items = list(items)

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)

    def __add__(self, o):
        if isinstance(o, SVec):
            return SVec([x + y for x, y in zip(self.items, o.items)])
        return SVec([x + o for x in self.items])

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, SVec):
            return SVec([x - y for x, y in zip(self.items, o.items)])
        return SVec([x - o for x in self.items])

    def __rsub__(self, o):
        return SVec([o - x for x in self.items])

    def __mul__(self, o):
        if isinstance(o, SVec):
            return SVec([x * y for x, y in zip(self.items, o.items)])
        return SVec([x * o for x in self.items])

    __rmul__ = __mul__

    def __truediv__(self, o):
        return SVec([x / o for x in self.items])

    def __neg__(self):
        return SVec([-x for x in self.items])

    def dot(self, o):
        acc = None
        for x, y in zip(self.items, o):
            t = x * y
            acc = t if acc is None else acc + t
        return acc


class SMat:
    __slots__ = ("rows",)

    def __init__(self, rows):
        self.rows = [list(r) for r in rows]

    @property
    def shape(self):
        return (len(self.rows), len(self.rows[0]))

    def __getitem__(self, ij):
        if isinstance(ij, tuple):
            i, j = ij
            return self.rows[i][j]
        return SVec(self.rows[ij])

    @property
    def T(self):
        return SMat(list(zip(*self.rows)))

    def __add__(self, o):
        import operator

        return SMat(_binop(self.rows, o, operator.add))

    __radd__ = __add__

    def __sub__(self, o):
        import operator

        return SMat(_binop(self.rows, o, operator.sub))

    def __mul__(self, o):
        import operator

        return SMat(_binop(self.rows, o, operator.mul))

    __rmul__ = __mul__

    def __truediv__(self, o):
        import operator

        return SMat(_binop(self.rows, o, operator.truediv))

    def __neg__(self):
        return SMat([[-x for x in r] for r in self.rows])

    def trace(self):
        acc = None
        for i in range(len(self.rows)):
            t = self.rows[i][i]
            acc = t if acc is None else acc + t
        return acc
