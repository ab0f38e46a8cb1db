"""Code-string front-end: restricted Python function -> flatcode -> R1CS.

Behavioral parity with reference
/root/reference/verifiable_mpc/tools/code_to_r1cs.py (itself adapted from
V. Buterin's zksnark tools): same flatcode opcodes
``['set'|'+'|'-'|'*'|'/', target, lhs, rhs]``, same variable placement
``[~one, *inputs, *outputs(~out*), *intermediates]`` and the same pow ->
repeated-multiplication lowering.  Rewritten for modern ``ast``
(``Constant`` nodes) and with index maps instead of repeated
``list.index`` scans.
"""

from __future__ import annotations

import ast
import itertools


def parse(code: str):
    return ast.parse(code).body


def _const_value(node):
    if isinstance(node, ast.Constant) and isinstance(node.value, int):
        return node.value
    return None


def extract_inputs_and_body(statements):
    if len(statements) != 1 or not isinstance(statements[0], ast.FunctionDef):
        raise ValueError("Expecting a single function declaration")
    fn = statements[0]
    inputs = [arg.arg for arg in fn.args.args]
    body = []
    returned = False
    for stmt in fn.body:
        if not isinstance(stmt, (ast.Assign, ast.Return)):
            raise ValueError("Expected variable assignment or return")
        if returned:
            raise ValueError("Cannot have statements after a return")
        if isinstance(stmt, ast.Return):
            returned = True
        body.append(stmt)
    return inputs, body


class _SymbolGen:
    def __init__(self):
        self._counter = itertools.count(1)

    def __call__(self):
        return f"sym_{next(self._counter)}"


def flatten_body(body):
    o = []
    gensym = _SymbolGen()
    for stmt in body:
        o.extend(_flatten_stmt(stmt, gensym))
    return o


def _flatten_stmt(stmt, gensym):
    if isinstance(stmt, ast.Assign):
        if len(stmt.targets) == 1 and isinstance(stmt.targets[0], ast.Name):
            targets = [(stmt.targets[0].id, stmt.value)]
        elif isinstance(stmt.targets[0], ast.Tuple):
            targets = [
                (t.id, stmt.value.elts[i])
                for i, t in enumerate(stmt.targets[0].elts)
            ]
        else:
            raise NotImplementedError
    elif isinstance(stmt, ast.Return):
        if isinstance(stmt.value, (ast.Name, ast.BinOp, ast.Constant)):
            targets = [("~out", stmt.value)]
        elif isinstance(stmt.value, ast.Tuple):
            targets = [
                (f"~out_{i}", elt) for i, elt in enumerate(stmt.value.elts)
            ]
        else:
            raise NotImplementedError
    else:
        raise NotImplementedError

    flattened = []
    for target, expr in targets:
        flattened.extend(_flatten_expr(target, expr, gensym))
    return flattened


_OPS = {ast.Add: "+", ast.Mult: "*", ast.Sub: "-", ast.Div: "/"}


def _atom(node):
    """Name or integer constant -> operand; else None."""
    if isinstance(node, ast.Name):
        return node.id
    v = _const_value(node)
    return v


def _flatten_expr(target, expr, gensym):
    if isinstance(expr, ast.Name):
        return [["set", target, expr.id]]
    if _const_value(expr) is not None:
        return [["set", target, _const_value(expr)]]
    if not isinstance(expr, ast.BinOp):
        raise ValueError(f"Unexpected expression: {ast.dump(expr)}")

    if isinstance(expr.op, ast.Pow):
        exp = _const_value(expr.right)
        if exp is None:
            raise ValueError("exponent must be a constant integer")
        if exp == 0:
            return [["set", target, 1]]
        if exp == 1:
            return _flatten_expr(target, expr.left, gensym)
        base = _atom(expr.left)
        if base is not None:
            o = []
        else:
            base = gensym()
            o = _flatten_expr(base, expr.left, gensym)
        nxt = base
        for i in range(1, exp):
            latest = nxt
            nxt = target if i == exp - 1 else gensym()
            o.append(["*", nxt, latest, base])
        return o

    op = _OPS.get(type(expr.op))
    if op is None:
        raise ValueError(f"Bad operation: {ast.dump(expr.op)}")

    var1 = _atom(expr.left)
    if var1 is not None:
        sub1 = []
    else:
        var1 = gensym()
        sub1 = _flatten_expr(var1, expr.left, gensym)
    var2 = _atom(expr.right)
    if var2 is not None:
        sub2 = []
    else:
        var2 = gensym()
        sub2 = _flatten_expr(var2, expr.right, gensym)
    return sub1 + sub2 + [[op, target, var1, var2]]


def get_var_placement(inputs, flatcode):
    """[~one, *inputs, *outputs, *intermediates]
    (reference code_to_r1cs.py:199-204)."""
    inputs = list(inputs)
    outputs = [
        c[1] for c in flatcode if c[1] not in inputs and c[1].startswith("~out")
    ]
    interims = [
        c[1] for c in flatcode if c[1] not in inputs and not c[1].startswith("~out")
    ]
    return ["~one"] + inputs + outputs + interims


def _insert_var(arr, index_of, var, used, reverse=False):
    if isinstance(var, str):
        if var not in used:
            raise ValueError("Using a variable before it is set!")
        arr[index_of[var]] += -1 if reverse else 1
    elif isinstance(var, int):
        arr[0] += var * (-1 if reverse else 1)


def flatcode_to_r1cs(inputs, flatcode, var_placement=None):
    varz = var_placement or get_var_placement(inputs, flatcode)
    index_of = {v: i for i, v in enumerate(varz)}
    A, B, C = [], [], []
    used = {i: True for i in inputs}
    for x in flatcode:
        a, b, c = [0] * len(varz), [0] * len(varz), [0] * len(varz)
        if x[1] in used:
            raise ValueError(f"Variable already used: {x[1]}")
        used[x[1]] = True
        if x[0] == "set":
            a[index_of[x[1]]] += 1
            _insert_var(a, index_of, x[2], used, reverse=True)
            b[0] = 1
        elif x[0] in ("+", "-"):
            c[index_of[x[1]]] = 1
            _insert_var(a, index_of, x[2], used)
            _insert_var(a, index_of, x[3], used, reverse=(x[0] == "-"))
            b[0] = 1
        elif x[0] == "*":
            c[index_of[x[1]]] = 1
            _insert_var(a, index_of, x[2], used)
            _insert_var(b, index_of, x[3], used)
        elif x[0] == "/":
            _insert_var(c, index_of, x[2], used)
            a[index_of[x[1]]] = 1
            _insert_var(b, index_of, x[3], used)
        A.append(a)
        B.append(b)
        C.append(c)
    return A, B, C


def flatcode_to_r1cs_cols(inputs, flatcode, var_placement=None):
    """Sparse-column R1CS: (A_cols, B_cols, C_cols) with
    cols[i] = [(constraint row j, int coeff)], built in O(total nonzeros).

    Semantics identical to :func:`flatcode_to_r1cs` (same rows, same
    coefficients — asserted by tests/test_qap_fast.py); the dense builder
    materializes d x (m+1) Python lists, which is O(d*m) memory and
    infeasible at 2^16 gates."""
    varz = var_placement or get_var_placement(inputs, flatcode)
    index_of = {v: i for i, v in enumerate(varz)}
    a_cols = [[] for _ in varz]
    b_cols = [[] for _ in varz]
    c_cols = [[] for _ in varz]
    used = {i: True for i in inputs}

    def ins(row, var, reverse=False):
        if isinstance(var, str):
            if var not in used:
                raise ValueError("Using a variable before it is set!")
            i = index_of[var]
            row[i] = row.get(i, 0) + (-1 if reverse else 1)
        elif isinstance(var, int):
            row[0] = row.get(0, 0) + var * (-1 if reverse else 1)

    for j, x in enumerate(flatcode):
        ra, rb, rc = {}, {}, {}
        if x[1] in used:
            raise ValueError(f"Variable already used: {x[1]}")
        used[x[1]] = True
        if x[0] == "set":
            i = index_of[x[1]]
            ra[i] = ra.get(i, 0) + 1
            ins(ra, x[2], reverse=True)
            rb[0] = 1
        elif x[0] in ("+", "-"):
            rc[index_of[x[1]]] = 1
            ins(ra, x[2])
            ins(ra, x[3], reverse=(x[0] == "-"))
            rb[0] = 1
        elif x[0] == "*":
            rc[index_of[x[1]]] = 1
            ins(ra, x[2])
            ins(rb, x[3])
        elif x[0] == "/":
            ins(rc, x[2])
            ra[index_of[x[1]]] = 1
            ins(rb, x[3])
        for row, cols in ((ra, a_cols), (rb, b_cols), (rc, c_cols)):
            for i, v in row.items():
                if v:
                    cols[i].append((j, v))
    return a_cols, b_cols, c_cols


def _grab_var(index_of, assignment, var):
    if isinstance(var, str):
        return assignment[index_of[var]]
    if isinstance(var, int):
        return var
    raise ValueError(f"What kind of expression is this? {var!r}")


def assign_variables(inputs, input_vars, flatcode):
    varz = get_var_placement(inputs, flatcode)
    index_of = {v: i for i, v in enumerate(varz)}
    assignment = [0] * len(varz)
    assignment[0] = 1
    for i, inp in enumerate(input_vars):
        assignment[i + 1] = inp
    for x in flatcode:
        t = index_of[x[1]]
        if x[0] == "set":
            assignment[t] = _grab_var(index_of, assignment, x[2])
        elif x[0] == "+":
            assignment[t] = _grab_var(index_of, assignment, x[2]) + _grab_var(
                index_of, assignment, x[3]
            )
        elif x[0] == "-":
            assignment[t] = _grab_var(index_of, assignment, x[2]) - _grab_var(
                index_of, assignment, x[3]
            )
        elif x[0] == "*":
            assignment[t] = _grab_var(index_of, assignment, x[2]) * _grab_var(
                index_of, assignment, x[3]
            )
        elif x[0] == "/":
            assignment[t] = _grab_var(index_of, assignment, x[2]) / _grab_var(
                index_of, assignment, x[3]
            )
    return assignment


def code_to_r1cs_with_inputs(code, input_vars):
    inputs, body = extract_inputs_and_body(parse(code))
    flatcode = flatten_body(body)
    A, B, C = flatcode_to_r1cs(inputs, flatcode)
    r = assign_variables(inputs, input_vars, flatcode)
    return r, A, B, C
