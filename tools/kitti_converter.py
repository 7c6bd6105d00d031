"""CLI: flatten the KITTI tracking dataset into the detection-style
`tracking_object/` layout (port of /root/reference/tools/kitti_converter.py).

Usage: python tools/kitti_converter.py --data_root data/KITTI
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

from jmodt_tpu.data.converter import (create_test_sample_data,
                                      create_train_sample_data)


def main():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--data_root', type=str, default='data/KITTI')
    parser.add_argument('--skip_test', action='store_true',
                        help='convert only the training sequences')
    args = parser.parse_args()

    in_dir = os.path.join(args.data_root, 'tracking')
    out_dir = os.path.join(args.data_root, 'tracking_object')
    create_train_sample_data(input_root=in_dir, output_root=out_dir)
    if not args.skip_test:
        create_test_sample_data(input_root=in_dir, output_root=out_dir)


if __name__ == '__main__':
    main()
