#!/usr/bin/env python3
"""Generate byte-parity hash fixtures for PyJsonSpec / MoleculeCodecSpec.

Two outputs under src/test/resources/:

1. pyjson_hash_fixtures.jsonl — one line per reference fixture dict whose
   pinned digest equals plain hash_dict(d) (sha256 of
   json.dumps(d, ensure_ascii=True, sort_keys=True)); fields:
   sha256 (the REFERENCE-pinned digest, from
   qcarchivetesting/qcarchivetesting/hash_data/*.json.xz), canonical (the
   CPython canonical rendering the Scala side must reproduce byte-for-byte),
   json (an UNSORTED, non-canonical re-dump the Scala side parses — proves
   the sort + re-render, not just a pass-through).
   Entries whose pinned digest does NOT equal plain hash_dict (20 neb +
   5 manybody) are hashed by the reference after a pydantic model roundtrip
   injects model defaults; that model layer is out of scope and they are
   excluded here (counted in the summary line).

2. qcel_molecule_hash_fixtures.jsonl — molecule get_hash vectors generated
   by executing, under real CPython + numpy, the published QCElemental
   algorithm (qcelemental/models/molecule.py Molecule.get_hash /
   float_prep): sha1 over the concatenation of json.dumps of
   [symbols, masses, molecular_charge, molecular_multiplicity, real,
   geometry, fragments, fragment_charges, fragment_multiplicities,
   connectivity], with float_prep noise rounding (GEOMETRY_NOISE=8,
   MASS_NOISE=6, CHARGE_NOISE=4; arrays np.around + |x|<5**-(n+1) zero
   flip, scalars round() + -0.0 flip) and numpy arrays flattened via
   ravel().tolist(). qcelemental itself is not installable in this
   environment, so these vectors pin the CPython byte behaviors (float
   repr, json separators, banker's rounding) that are the actual parity
   risk; the algorithm/constants are transcribed from qcelemental's public
   source and cited in Molecules.scala.
"""
import json
import lzma
import math
import os
from hashlib import sha1, sha256

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
HASH_DATA = "/root/reference/qcarchivetesting/qcarchivetesting/hash_data"
OUT = os.path.join(REPO, "src/test/resources")

FILES = [
    "dict_hash_test_data",
    "qc_specification_tests",
    "optimization_specification_tests",
    "torsiondrive_specification_tests",
    "gridoptimization_specification_tests",
    "neb_specification_tests",
    "manybody_specification_tests",
    "reaction_specification_tests",
]


def hash_dict(d):
    j = json.dumps(d, ensure_ascii=True, sort_keys=True).encode("utf-8")
    return sha256(j).hexdigest()


def gen_pyjson():
    kept, skipped = 0, 0
    with open(os.path.join(OUT, "pyjson_hash_fixtures.jsonl"), "w") as out:
        for f in FILES:
            with lzma.open(os.path.join(HASH_DATA, f"{f}.json.xz"), "rt") as fh:
                data = json.load(fh)
            for digest, d in data.items():
                if hash_dict(d) != digest:
                    skipped += 1  # model-roundtrip-hashed; out of scope
                    continue
                canonical = json.dumps(d, ensure_ascii=True, sort_keys=True)
                # unsorted re-dump with extra whitespace: the Scala side
                # must PARSE and re-render, not string-compare
                messy = json.dumps(d, ensure_ascii=False, indent=1)
                out.write(json.dumps(
                    {"sha256": digest, "canonical": canonical, "json": messy},
                    sort_keys=True) + "\n")
                kept += 1
    print(f"pyjson: {kept} fixtures written, {skipped} model-roundtrip entries skipped")


# ---- QCElemental get_hash (public algorithm, transcribed) ----------------

GEOMETRY_NOISE = 8
MASS_NOISE = 6
CHARGE_NOISE = 4


def float_prep(array, around):
    if isinstance(array, (list, np.ndarray)):
        array = np.around(np.asarray(array, dtype=float), around)
        array[np.abs(array) < 5 ** (-(around + 1))] = 0
    elif isinstance(array, (float, int)):
        array = round(array, around)
        if array == -0.0:
            array = 0.0
    else:
        raise TypeError(type(array))
    return array


def get_hash(mol):
    m = sha1()
    concat = ""
    fields = ["symbols", "masses", "molecular_charge", "molecular_multiplicity",
              "real", "geometry", "fragments", "fragment_charges",
              "fragment_multiplicities", "connectivity"]
    for field in fields:
        data = mol.get(field)
        if data is not None:
            if field == "geometry":
                data = float_prep(data, GEOMETRY_NOISE)
            elif field == "fragment_charges":
                data = float_prep(data, CHARGE_NOISE)
            elif field == "molecular_charge":
                data = float_prep(data, CHARGE_NOISE)
            elif field == "masses":
                data = float_prep(data, MASS_NOISE)
        piece = json.dumps(data, default=lambda x: x.ravel().tolist())
        concat += piece
    m.update(concat.encode("utf-8"))
    return concat, m.hexdigest()


def gen_molecules():
    mols = [
        # water, canonical-ish
        {"symbols": ["O", "H", "H"],
         "masses": [15.99491461957, 1.00782503223, 1.00782503223],
         "molecular_charge": 0.0, "molecular_multiplicity": 1,
         "real": [True, True, True],
         "geometry": [0.0, 0.0, -0.12947694, 0.0, -1.49418734, 1.02744651,
                      0.0, 1.49418734, 1.02744651]},
        # jitter below the geometry noise floor must not change the hash —
        # same rounded geometry as above
        {"symbols": ["O", "H", "H"],
         "masses": [15.99491461957, 1.00782503223, 1.00782503223],
         "molecular_charge": 0.0, "molecular_multiplicity": 1,
         "real": [True, True, True],
         "geometry": [1e-10, -1e-10, -0.129476940001, 0.0, -1.494187339999,
                      1.02744651, 0.0, 1.49418734, 1.027446510002]},
        # negative zero and tiny-value flip cases
        {"symbols": ["He"], "masses": [4.00260325413],
         "molecular_charge": -0.0, "molecular_multiplicity": 1,
         "real": [True], "geometry": [-0.0, 1e-9, -3e-7]},
        # charged ion, rounding at the charge noise floor (banker's)
        {"symbols": ["Na"], "masses": [22.98976928],
         "molecular_charge": 0.99995, "molecular_multiplicity": 1,
         "real": [True], "geometry": [0.0, 0.0, 0.0]},
        {"symbols": ["Cl"], "masses": [34.968852682],
         "molecular_charge": -1.00005, "molecular_multiplicity": 1,
         "real": [False], "geometry": [12.3456789012345, -7.65432109876, 100.0]},
        # fragments + connectivity (water dimer-ish)
        {"symbols": ["O", "H", "O", "H"],
         "masses": [15.99491461957, 1.00782503223, 15.99491461957, 1.00782503223],
         "molecular_charge": 0.0, "molecular_multiplicity": 1,
         "real": [True, True, True, True],
         "geometry": [0.0, 0.0, 0.0, 0.0, 0.0, 1.8, 5.0, 0.0, 0.0, 5.0, 0.0, 1.8],
         "fragments": [np.array([0, 1]), np.array([2, 3])],
         "fragment_charges": [0.0, -0.0],
         "fragment_multiplicities": [1, 1],
         "connectivity": [(0, 1, 1.0), (2, 3, 1.5)]},
        # no masses/real provided (unvalidated payload): null fields
        {"symbols": ["C", "H"], "molecular_charge": 0.5,
         "molecular_multiplicity": 2,
         "geometry": [0.05, -0.25, 0.125, 1.0, 2.0, 3.0]},
    ]
    with open(os.path.join(OUT, "qcel_molecule_hash_fixtures.jsonl"), "w") as out:
        for mol in mols:
            concat, digest = get_hash(mol)

            def clean(x):
                if isinstance(x, np.ndarray):
                    return x.tolist()
                if isinstance(x, (list, tuple)):
                    return [clean(v) for v in x]
                return x
            rec = {k: clean(v) for k, v in mol.items()}
            out.write(json.dumps({"molecule": rec, "canonical": concat,
                                  "sha1": digest}, sort_keys=True) + "\n")
    print(f"molecules: {len(mols)} fixtures written")


# Default atomic masses a qcelemental Molecule computes for a payload that
# omits them (property getter falls back to the element table). MASS_NOISE=6
# rounding makes these version-stable: any published table value for these
# isotopes rounds to the same 6 decimals.
DEFAULT_MASSES = {"O": 15.99491461957, "H": 1.00782503223, "C": 12.0}

# The reference's own pinned get_hash digests:
#   qcportal/qcportal/molecules/test_models.py:68 (water_dimer_minima)
#   qcfractal/qcfractal/components/molecules/test_client.py:292-294
REFERENCE_VECTORS = [
    ("water_dimer_minima", "3c4b98f515d64d1adc1648fe1fe1d6789e978d34"),
    ("water_stacked", "27061c76f7de3eca6a2d9521d660661fe177192f"),
    ("benzene_dimer", "0990d963680c22adde43bd650dff75e3b16808be"),
]

MOLECULE_DATA = "/root/reference/qcarchivetesting/qcarchivetesting/molecule_data"


def gen_reference_molecules():
    """Vectors whose digests come from the REFERENCE REPO ITSELF (literal
    asserts in its test suite), closing the F8 transcription boundary: a
    field-handling or constant transcription error would fail these even
    though the CPython-generated fixtures above cannot catch it. Molecule
    payloads are the reference's own molecule_data/*.json with qcelemental
    property-default semantics applied (masses computed when absent, real
    all-True, connectivity None)."""
    with open(os.path.join(OUT, "qcel_reference_hash_vectors.jsonl"), "w") as out:
        for name, pinned in REFERENCE_VECTORS:
            with open(os.path.join(MOLECULE_DATA, name + ".json")) as f:
                d = json.load(f)
            n = len(d["symbols"])
            mol = {
                "symbols": d["symbols"],
                "masses": d.get("masses",
                                [DEFAULT_MASSES[s] for s in d["symbols"]]),
                "molecular_charge": d.get("molecular_charge", 0.0),
                "molecular_multiplicity": d.get("molecular_multiplicity", 1),
                "real": d.get("real", [True] * n),
                "geometry": d["geometry"],
                "fragments": [np.array(f) for f in d["fragments"]],
                "fragment_charges": d["fragment_charges"],
                "fragment_multiplicities": d["fragment_multiplicities"],
            }
            concat, digest = get_hash(mol)
            assert digest == pinned, f"{name}: {digest} != pinned {pinned}"

            def clean(x):
                if isinstance(x, np.ndarray):
                    return x.tolist()
                if isinstance(x, (list, tuple)):
                    return [clean(v) for v in x]
                return x
            rec = {k: clean(v) for k, v in mol.items()}
            out.write(json.dumps({"name": name, "molecule": rec,
                                  "canonical": concat,
                                  "sha1": digest}, sort_keys=True) + "\n")
    print(f"reference molecule vectors: {len(REFERENCE_VECTORS)} written, "
          "all digests match the reference's pinned values")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_pyjson()
    gen_molecules()
    gen_reference_molecules()
