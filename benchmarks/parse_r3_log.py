"""Parse benchmarks/r3_measure.log into one JSON summary.

The runbook appends labeled blocks; this pulls the per-arch result
lines and the bench.py headline JSON out of each block so the round's
TPU numbers can be digested at a glance.

Usage: python benchmarks/parse_r3_log.py [log_path]
"""

import json
import re
import sys


def parse(path):
    blocks = {}
    label = None
    for line in open(path, errors='replace'):
        m = re.match(r'^=== (\S+) (\d\d:\d\d:\d\d) ===', line)
        if m:
            label = m.group(1)
            blocks.setdefault(label, {'start': m.group(2), 'lines': []})
            continue
        m = re.match(r'^--- rc=(\d+) ---', line)
        if m and label:
            blocks[label]['rc'] = int(m.group(1))
            label = None
            continue
        if label:
            line = line.strip()
            if re.match(r'^\w+: batch \d+:', line):
                blocks[label]['lines'].append(line)
            elif line.startswith('{"metric"'):
                try:
                    blocks[label]['headline'] = json.loads(line)
                except json.JSONDecodeError:
                    pass
            elif re.match(r'^d=\s*\d+ fwd', line):
                blocks[label]['lines'].append(line)
            elif line.startswith('real\t'):
                blocks[label]['wall'] = line.split('\t')[1]
    return blocks


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else 'benchmarks/r3_measure.log'
    blocks = parse(path)
    for label, info in blocks.items():
        rc = info.get('rc', '?')
        wall = info.get('wall', '?')
        print(f'## {label} (rc={rc}, {wall})')
        if 'headline' in info:
            h = info['headline']
            print(f"  headline: {h['value']} {h['unit']} "
                  f"vs_baseline={h['vs_baseline']}")
        for line in info['lines']:
            print(f'  {line}')


if __name__ == '__main__':
    main()
