"""Circuit graph export and flatcode conversion.

Completes the reference's work-in-progress visualization module
(/root/reference/wip.py): renders a circuit-builder circuit as Graphviz DOT
(no external dependencies) and exports flatcode for the R1CS pipeline.
"""

from __future__ import annotations

from ..ac20 import circuit_builder as cb


def circuit_to_dot(circuit) -> str:
    """Graphviz DOT source for the gate DAG."""
    lines = ["digraph circuit {", "  rankdir=LR;"]
    for v in circuit.circuitvars:
        if v.input_index is not None:
            lines.append(
                f'  "{v.name}" [shape=box, style=filled, fillcolor=lightblue];'
            )
    for gate in circuit.gates:
        gid = f"gate_{gate.index}"
        label = gate.op.value
        shape = "circle" if gate.op == cb.op.mul else "ellipse"
        lines.append(f'  "{gid}" [label="{label}", shape={shape}];')
        for inp in gate.inputs:
            if isinstance(inp, cb.CircuitVar):
                if inp.input_index is not None:
                    lines.append(f'  "{inp.name}" -> "{gid}";')
                else:
                    src = circuit._gate_by_output_name.get(inp.name)
                    if src is not None:
                        lines.append(f'  "gate_{src.index}" -> "{gid}";')
            else:
                const = f"const_{gate.index}_{inp}"
                lines.append(f'  "{const}" [label="{inp}", shape=plaintext];')
                lines.append(f'  "{const}" -> "{gid}";')
        if gate.output.output_index is not None:
            lines.append(
                f'  "out_{gate.output.name}" [shape=doublecircle, '
                f'style=filled, fillcolor=lightyellow];'
            )
            lines.append(f'  "{gid}" -> "out_{gate.output.name}";')
    lines.append("}")
    return "\n".join(lines)


def circuit_to_flatcode(circuit) -> list:
    """Flatcode lines ['*'|'+'|'set', target, lhs, rhs] for the gate list
    (the bridge from the builder DSL to the R1CS front-end)."""
    flat = []
    for gate in circuit.gates:

        def name_of(w):
            if isinstance(w, cb.CircuitVar):
                return w.name
            return w

        target = name_of(gate.output)
        lhs = name_of(gate.inputs[0])
        rhs = name_of(gate.inputs[1])
        if gate.op == cb.op.add:
            flat.append(["+", target, lhs, rhs])
        elif gate.op in (cb.op.mul, cb.op.scalar_mul):
            flat.append(["*", target, lhs, rhs])
        else:
            raise NotImplementedError
    return flat


def save_dot(circuit, path) -> None:
    with open(path, "w") as fh:
        fh.write(circuit_to_dot(circuit))
