#!/usr/bin/env python3
"""Generate src/main/resources/graft/ocsf_schema.tsv from the reference's
generated OCSF schema tables (processor/ocsfstandardizationprocessor/ocsf/
v1_*/schema.go — themselves generated from the public https://schema.ocsf.io
exports, see each file's header comment).

This is a build-time data extraction, re-run only when the reference (or the
OCSF spec versions it tracks) changes. The emitted TSV carries, per version:

  C <ver> <uid> <ClassName> <validatorFunc>     class registry
  R <ver> <owner> f1,f2,...                     required fields
  A <ver> <owner> f1,f2                         at-least-one group (one/line)
  J <ver> <owner> f1,f2                         just-one group (one/line)
  T <ver> <owner> f1:type1,f2:type2,...         field coercion types
  O <ver> <owner> f1:objtype1,...               object-typed fields
  E <ver> <owner> <field> v1,v2,...             integer enum constraint
  L <ver> <owner> f1:max1,...                   string max lengths

where <owner> is `c<uid>` for an event class or `o<objtype>` for a nested
object type. Versions are emitted dotted ("1.1.0").
"""
import re
import sys
from pathlib import Path

REF = Path("/root/reference/processor/ocsfstandardizationprocessor/ocsf")
OUT = Path(__file__).resolve().parent.parent / "src/main/resources/graft/ocsf_schema.tsv"


def parse_string_list(s):
    return re.findall(r'"([^"]*)"', s)


def parse_string_map(s):
    return dict(re.findall(r'"([^"]*)":\s*"([^"]*)"', s))


def parse_groups(s):
    return [parse_string_list(g) for g in re.findall(r'\{([^{}]*)\}', s)]


def parse_reqs_block(body):
    """Parse the inside of one fieldReqs literal `{ ... }`."""
    out = {}
    m = re.search(r'required:\s*\[\]string\{([^}]*)\}', body)
    out["required"] = parse_string_list(m.group(1)) if m else []
    m = re.search(r'objectFields:\s*map\[string\]string\{([^}]*)\}', body)
    out["objectFields"] = parse_string_map(m.group(1)) if m else {}
    m = re.search(r'fieldTypes:\s*map\[string\]string\{([^}]*)\}', body)
    out["fieldTypes"] = parse_string_map(m.group(1)) if m else {}
    m = re.search(r'atLeastOne:\s*\[\]\[\]string\{(.*?)\}\s*,?\s*$', body, re.M)
    out["atLeastOne"] = parse_groups(m.group(1)) if m else []
    m = re.search(r'justOne:\s*\[\]\[\]string\{(.*?)\}\s*,?\s*$', body, re.M)
    out["justOne"] = parse_groups(m.group(1)) if m else []
    return out


def split_entries(block):
    """Split a Go map literal body into (key, entryBody) pairs by brace depth."""
    entries = []
    depth = 0
    key = None
    start = 0
    i = 0
    while i < len(block):
        ch = block[i]
        if ch == '{':
            if depth == 0:
                # key text precedes this brace
                key = block[start:i].strip().rstrip(':').strip()
            depth += 1
            if depth == 1:
                body_start = i + 1
        elif ch == '}':
            depth -= 1
            if depth == 0:
                entries.append((key, block[body_start:i]))
                start = i + 1
                while start < len(block) and block[start] in ',\n\t ':
                    start += 1
                i = start - 1
        i += 1
    return entries


def extract_map_literal(src, decl):
    """Return the body of `var <decl> = ...{ ... }` by brace matching."""
    m = re.search(re.escape(decl), src)
    if not m:
        return None
    i = src.index('{', m.end())
    depth = 0
    for j in range(i, len(src)):
        if src[j] == '{':
            depth += 1
        elif src[j] == '}':
            depth -= 1
            if depth == 0:
                return src[i + 1:j]
    return None


ENUM_RE = re.compile(
    r'if v, ok := data\["(\w+)"\]; ok \{\s*'
    r'if intVal, ok := toInt64\(v\); ok \{\s*'
    r'switch intVal \{\s*case ([0-9,\s\-]+?):', re.S)
LEN_RE = re.compile(
    r'if v, ok := data\["(\w+)"\]; ok \{\s*'
    r'if strVal, ok := v\.\(string\); ok \{\s*'
    r'if len\(strVal\) > (\d+)', re.S)
DISPATCH_RE = re.compile(r'case ClassUID(\w+):\s*return validate(\w+)\(m\)')
NESTED_RE = re.compile(r'if err := validate(\w+)\(m\); err != nil \{\s*'
                       r'errs = append\(errs, fmt\.Errorf\("([\w.]+?)(?:\[%d\])?: %w"', re.S)


def parse_version(vdir):
    src = (vdir / "schema.go").read_text()
    ver = vdir.name[1:].replace("_", ".")  # v1_1_0 -> 1.1.0

    uid_by_name = {m.group(1): int(m.group(2)) for m in
                   re.finditer(r'ClassUID(\w+)\s*=\s*(\d+)', src)}

    # class uid -> validator function name, from the ValidateClass dispatch
    func_by_uid = {}
    for name, fn in DISPATCH_RE.findall(src):
        if name in uid_by_name:
            func_by_uid[uid_by_name[name]] = fn

    # per-validator-function enum/maxlen constraints + nested-edge field map
    funcs = {}
    for chunk in re.split(r'(?m)^func ', src)[1:]:
        m = re.match(r'validate(\w+)\(data map\[string\]any\) error', chunk)
        if not m:
            continue
        fname = m.group(1)
        enums = {}
        for field, vals in ENUM_RE.findall(chunk):
            enums[field] = [int(v.strip()) for v in vals.split(',') if v.strip()]
        lens = {f: int(n) for f, n in LEN_RE.findall(chunk)}
        nested = {field: fn for fn, field in NESTED_RE.findall(chunk)}
        required = re.findall(r'errors\.New\("(\w+) is required"\)', chunk)
        any_of = [ [f.strip() for f in g.split(',')] for g in
                   re.findall(r'at least one of \[([^\]]+)\] must be set', chunk) ]
        funcs[fname] = {"enums": enums, "lens": lens, "nested": nested,
                        "required": required, "anyOf": any_of}

    class_reqs = {}
    body = extract_map_literal(src, "var classFieldReqs = map[int]*fieldReqs")
    for key, entry in split_entries(body):
        m = re.match(r'ClassUID(\w+)', key)
        if not m or m.group(1) not in uid_by_name:
            continue
        class_reqs[uid_by_name[m.group(1)]] = (m.group(1), parse_reqs_block(entry))

    obj_reqs = {}
    body = extract_map_literal(src, "var objectFieldReqs = map[string]*fieldReqs")
    for key, entry in split_entries(body):
        m = re.match(r'"([^"]+)"', key)
        if m:
            obj_reqs[m.group(1)] = parse_reqs_block(entry)

    # object type -> validator function: resolved through the nested edges
    # (field -> func) joined with objectFields (field -> objtype)
    objfunc = {}
    for uid, (cname, reqs) in class_reqs.items():
        fn = func_by_uid.get(uid)
        nested = funcs.get(fn, {}).get("nested", {}) if fn else {}
        for field, objtype in reqs["objectFields"].items():
            nf = nested.get(field)
            if nf and objtype not in objfunc:
                objfunc[objtype] = nf
    # objects nest in objects too — propagate through object validators
    changed = True
    while changed:
        changed = False
        for objtype, fn in list(objfunc.items()):
            nested = funcs.get(fn, {}).get("nested", {})
            reqs = obj_reqs.get(objtype)
            if not reqs:
                continue
            for field, sub in reqs["objectFields"].items():
                nf = nested.get(field)
                if nf and sub not in objfunc:
                    objfunc[sub] = nf
                    changed = True

    lines = []

    def emit_owner(owner, reqs, vfuncs):
        if reqs["required"]:
            lines.append(f"R\t{ver}\t{owner}\t{','.join(reqs['required'])}")
        for g in reqs["atLeastOne"]:
            lines.append(f"A\t{ver}\t{owner}\t{','.join(g)}")
        for g in reqs["justOne"]:
            lines.append(f"J\t{ver}\t{owner}\t{','.join(g)}")
        if reqs["fieldTypes"]:
            kv = ','.join(f"{k}:{v}" for k, v in sorted(reqs["fieldTypes"].items()))
            lines.append(f"T\t{ver}\t{owner}\t{kv}")
        if reqs["objectFields"]:
            kv = ','.join(f"{k}:{v}" for k, v in sorted(reqs["objectFields"].items()))
            lines.append(f"O\t{ver}\t{owner}\t{kv}")
        if vfuncs:
            for field, vals in sorted(vfuncs["enums"].items()):
                lines.append(f"E\t{ver}\t{owner}\t{field}\t{','.join(map(str, vals))}")
            if vfuncs["lens"]:
                kv = ','.join(f"{k}:{v}" for k, v in sorted(vfuncs["lens"].items()))
                lines.append(f"L\t{ver}\t{owner}\t{kv}")

    # ValidateClass-dispatched classes absent from classFieldReqs (e.g.
    # BaseEvent, uid 0) still validate at runtime — synthesize their
    # requirement set from the validator body so no dispatch case is lost.
    # objectFields come from the validator's nested edges resolved through
    # the objtype->validator map, so deep validation recurses for these
    # classes too (fieldTypes stay empty: validators carry no coercion types)
    uid_name = {v: k for k, v in uid_by_name.items()}
    func_objtype = {}
    for ot, fn in sorted(objfunc.items()):
        assert fn not in func_objtype, \
            f"validator {fn} serves both {func_objtype[fn]} and {ot}; " \
            "synthesized-class object edges would be ambiguous"
        func_objtype[fn] = ot
    for uid, fn in func_by_uid.items():
        if uid not in class_reqs and fn in funcs:
            nested_objs = {field: func_objtype[nf]
                           for field, nf in funcs[fn]["nested"].items()
                           if nf in func_objtype}
            class_reqs[uid] = (uid_name.get(uid, fn), {
                "required": funcs[fn]["required"],
                "objectFields": nested_objs, "fieldTypes": {},
                "atLeastOne": funcs[fn]["anyOf"], "justOne": []})
    for uid in sorted(class_reqs):
        cname, reqs = class_reqs[uid]
        fn = func_by_uid.get(uid, "")
        lines.append(f"C\t{ver}\t{uid}\t{cname}\t{fn}")
        emit_owner(f"c{uid}", reqs, funcs.get(fn))
    for objtype in sorted(obj_reqs):
        emit_owner(f"o{objtype}", obj_reqs[objtype], funcs.get(objfunc.get(objtype)))
    return lines


def main():
    all_lines = []
    for vdir in sorted(REF.iterdir()):
        if vdir.is_dir() and vdir.name.startswith("v"):
            lines = parse_version(vdir)
            all_lines.extend(lines)
            print(f"{vdir.name}: {len(lines)} lines", file=sys.stderr)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(all_lines) + "\n")
    print(f"wrote {OUT} ({len(all_lines)} lines)", file=sys.stderr)


if __name__ == "__main__":
    main()
