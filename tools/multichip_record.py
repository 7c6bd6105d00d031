"""Write MULTICHIP_FULL_r05.json from a `__graft_entry__.py dryrun N fullexec` log.

VERDICT r4 ask #4: record an EXECUTED (not compile-only) full-size sharded
train step on the virtual 8-device mesh — loss + grad_norm from the run,
so runtime sharding bugs (collective deadlocks, padding mismatches) are
excluded by evidence rather than by a compile.

Usage: python tools/multichip_record.py output/fullexec_r05.log MULTICHIP_FULL_r05.json
"""

import json
import re
import sys


def main(log_path, out_path):
    text = open(log_path).read()
    rec = {'n': 8, 'log': log_path, 'ok': False, 'executed': False}
    m = re.search(r'dryrun_multichip\((\d+)\) dp: loss=([\d.eE+-]+) '
                  r'grad_norm=([\d.eE+-]+) OK', text)
    if m:
        rec['n'] = int(m.group(1))
        rec['tiny_dp'] = {'loss': float(m.group(2)),
                          'grad_norm': float(m.group(3))}
    m = re.search(r'full-size dp COMPILE OK: (\d+)s, '
                  r'output_bytes=(\w+), temp_bytes=(\w+)', text)
    if m:
        rec['full_compile'] = {
            'seconds': int(m.group(1)),
            'output_bytes': None if m.group(2) == 'None' else int(m.group(2)),
            'temp_bytes': None if m.group(3) == 'None' else int(m.group(3))}
    m = re.search(r'full-size dp EXECUTE OK: (\d+)s, loss=([\d.eE+-]+) '
                  r'grad_norm=([\d.eE+-]+)', text)
    if m:
        rec['executed'] = True
        rec['full_execute'] = {'seconds': int(m.group(1)),
                               'loss': float(m.group(2)),
                               'grad_norm': float(m.group(3))}
    m = re.search(r'dp(\d+)xsp2: loss=([\d.eE+-]+) grad_norm=([\d.eE+-]+) OK',
                  text)
    if m:
        rec['tiny_dp_sp2'] = {'loss': float(m.group(2)),
                              'grad_norm': float(m.group(3))}
    m = re.search(r'sharded-streams: (\d+) rows OK', text)
    if m:
        rec['sharded_streams_rows'] = int(m.group(1))
    rec['ok'] = rec['executed'] and 'tiny_dp' in rec
    with open(out_path, 'w') as f:
        json.dump(rec, f, indent=1)
        f.write('\n')
    print(json.dumps(rec))
    return 0 if rec['ok'] else 1


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
