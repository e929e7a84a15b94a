"""The reference test/ifs namelist variant matrix, shared between
tests/test_ifs_configs.py and tools/make_regression_goldens.py.

Reference parity: test/ifs/Makefile:12-63 generates 7 namelist variants
from configCY47R1.nam by text substitution (change_namelist.sh) and runs
the ecrad binary on the meridian slice with each.
"""
import os
import re

IFS_DIR = "/root/reference/test/ifs"

# (name, namelist substitutions) as in test/ifs/Makefile
VARIANTS = [
    ("default", {}),
    ("noaer", {"use_aerosols": "false"}),
    ("expran", {"overlap_scheme_name": '"Exp-Ran"'}),
    ("tripleclouds", {"sw_solver_name": '"Tripleclouds"',
                      "lw_solver_name": '"Tripleclouds"',
                      "overlap_scheme_name": '"Exp-Ran"'}),
    ("lwscat", {"do_lw_cloud_scattering": "true"}),
    ("spartacus", {"sw_solver_name": '"SPARTACUS"',
                   "lw_solver_name": '"SPARTACUS"',
                   "do_3d_effects": "true",
                   "overlap_scheme_name": '"Exp-Ran"',
                   "do_sw_delta_scaling_with_gases": "false"}),
    ("spartacus_maxentr", {"sw_solver_name": '"SPARTACUS"',
                           "lw_solver_name": '"SPARTACUS"',
                           "do_3d_effects": "true",
                           "overlap_scheme_name": '"Exp-Ran"',
                           "sw_entrapment_name": '"Maximum"',
                           "do_sw_delta_scaling_with_gases": "false"}),
]

# output-file variables pinned by the full-width goldens
GOLDEN_VARS = ["flux_up_lw", "flux_dn_lw", "flux_up_sw", "flux_dn_sw",
               "flux_dn_direct_sw", "flux_up_lw_clear", "flux_dn_lw_clear",
               "flux_up_sw_clear", "flux_dn_sw_clear", "cloud_cover_lw",
               "cloud_cover_sw", "lw_derivative"]


def change_namelist(base_text: str, subs: dict) -> str:
    """The change_namelist.sh equivalent: replace `key = value` lines."""
    out = base_text
    for key, value in subs.items():
        pattern = re.compile(rf"^(\s*{key}\s*)=[^,\n!]*",
                             re.MULTILINE | re.IGNORECASE)
        if pattern.search(out):
            out = pattern.sub(rf"\1= {value}", out)
        else:
            out = out.replace("&radiation\n",
                              f"&radiation\n{key} = {value},\n", 1)
    return out


def write_variant_namelist(dirpath, name, subs, extra_subs=None):
    """Write the variant's namelist (data dir fixed) and return its path."""
    base = open(os.path.join(IFS_DIR, "configCY47R1.nam")).read()
    text = change_namelist(base, subs)
    text = text.replace('"../../data"', '"/root/reference/data"')
    if extra_subs:
        text = change_namelist(text, extra_subs)
    path = os.path.join(str(dirpath), f"{name}.nam")
    with open(path, "w") as f:
        f.write(text)
    return path
