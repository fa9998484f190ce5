"""Self-test of tools/check_oracle.py canon/sort/type-diagnostic logic."""
import sys, importlib.util, pandas as pd
spec = importlib.util.spec_from_file_location("co", __file__.rsplit("/",1)[0] + "/check_oracle.py")
co = importlib.util.module_from_spec(spec); spec.loader.exec_module(co)

# 1. type-only diff must stay row-ALIGNED regardless of int/float tags
a = pd.DataFrame({"k": [3397, 12, 900], "v": ["x", "y", "z"]})
b = pd.DataFrame({"k": [3397.0, 12.0, 900.0], "v": ["x", "y", "z"]})
ra, _ = co.canon(a); rb, _ = co.canon(b)
assert len(ra) == len(rb)
for x, y in zip(ra, rb):
    assert all(co.values_equal(p, q) for p, q in zip(x, y)), (x, y)
print("PASS type-only rows align under the value-sort")

# 2. genuinely different values must NOT be classified type-only
c = pd.DataFrame({"k": [3397, 13, 900], "v": ["x", "y", "z"]})
rc, _ = co.canon(c)
assert not all(all(co.values_equal(p, q) for p, q in zip(x, y))
               for x, y in zip(ra, rc))
print("PASS value diffs still detected")

# 3. NaN ordering is stable (no TypeError), nested lists recurse
d = pd.DataFrame({"k": [float('nan'), 1.0, 2.0], "l": [[1, 2], [3], []]})
rd, _ = co.canon(d)
assert len(rd) == 3
print("PASS nan + nested list sort")

# 4. sort is consistent across mixed magnitudes (regression for the
#    str()-sort bug: '10' < '9' lexicographically)
e  = pd.DataFrame({"k": [9, 10, 100]})
e2 = pd.DataFrame({"k": [9.0, 10.0, 100.0]})
re_, _ = co.canon(e); re2, _ = co.canon(e2)
assert [co.val(r[0]) for r in re_] == [9, 10, 100]
assert [co.val(r[0]) for r in re2] == [9.0, 10.0, 100.0]
print("PASS numeric (not lexicographic) ordering on both sides")
print("ALL PASS")
