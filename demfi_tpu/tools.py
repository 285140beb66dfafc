"""Checkpoint conversion tools.

  # reference .pt -> native msgpack
  python -m demfi_tpu.tools import_pt  DeMFInet_exp1_latest.pt out_dir/

  # native msgpack -> reference-format .pt (for users of the original repo)
  python -m demfi_tpu.tools export_pt  checkpoint_dir/DeMFInet_exp1/DeMFInet_exp1_latest.msgpack out.pt
"""
from __future__ import annotations

import json
import os
import sys


def import_pt(src: str, out_dir: str) -> str:
    import flax.serialization

    from demfi_tpu.checkpoint import load_pt_checkpoint

    variables, meta = load_pt_checkpoint(src)
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(
        out_dir, os.path.splitext(os.path.basename(src))[0])
    with open(base + ".msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    with open(base + ".json", "w") as f:
        json.dump(meta, f, default=float, indent=1)
    print(f"wrote {base}.msgpack ({meta})")
    return base


def export_pt(src_msgpack: str, out_pt: str) -> str:
    import flax.serialization
    import torch

    from demfi_tpu.checkpoint import flax_to_torch_state_dict

    with open(src_msgpack, "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())
    sd = {k: torch.from_numpy(v.copy())
          for k, v in flax_to_torch_state_dict(variables).items()}
    meta_path = src_msgpack.replace(".msgpack", ".json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    torch.save({**meta, "state_dict_Model": sd}, out_pt)
    print(f"wrote {out_pt} ({len(sd)} tensors)")
    return out_pt


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3 or argv[0] not in ("import_pt", "export_pt"):
        print(__doc__)
        raise SystemExit(2)
    if argv[0] == "import_pt":
        import_pt(argv[1], argv[2])
    else:
        export_pt(argv[1], argv[2])


if __name__ == "__main__":
    main()
