#!/usr/bin/env python3
"""Export a state dict from a reference whole-module pickle.

The reference saves entire modules (``tch.save(net, path)``,
/root/reference/deepv3_funcs.py:188), which can only be unpickled where the
original class definitions import.  Run THIS script inside the reference
environment to produce a plain ``state_dict`` file that
``ee_semantic_segmentation_tpu.models.import_reference`` can consume
anywhere:

    python tools/export_reference_state_dict.py model_final.pth model_sd.pth
"""

import sys

import torch


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj.get("model_state_dict", obj)
    torch.save({k: v for k, v in sd.items()}, dst)
    print(f"wrote {len(sd)} tensors to {dst}")


if __name__ == "__main__":
    main()
