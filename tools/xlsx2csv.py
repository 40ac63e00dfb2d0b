#!/usr/bin/env python3
"""Minimal stdlib xlsx -> csv converter (sheet1 only).

The crime dataset ships as crime_data_normalized.xlsx; Spark has no Excel
source (SURVEY S6), so the loader takes a CSV conversion produced offline:

    python3 tools/xlsx2csv.py in.xlsx out.csv
"""
import sys, zipfile, re, csv
from xml.etree import ElementTree as ET

NS = {'m': 'http://schemas.openxmlformats.org/spreadsheetml/2006/main'}
T = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t'


def convert(src, dst):
    z = zipfile.ZipFile(src)
    shared = []
    if 'xl/sharedStrings.xml' in z.namelist():
        root = ET.fromstring(z.read('xl/sharedStrings.xml'))
        for si in root.findall('m:si', NS):
            shared.append(''.join(t.text or '' for t in si.iter(T)))
    root = ET.fromstring(z.read('xl/worksheets/sheet1.xml'))

    def colnum(ref):
        s = re.match(r'[A-Z]+', ref).group(0)
        n = 0
        for ch in s:
            n = n * 26 + ord(ch) - 64
        return n - 1

    rows = []
    for row in root.find('m:sheetData', NS).findall('m:row', NS):
        cells = {}
        for c in row.findall('m:c', NS):
            v = c.find('m:v', NS)
            val = v.text if v is not None else ''
            if c.get('t') == 's':
                val = shared[int(val)]
            cells[colnum(c.get('r'))] = val
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i, '') for i in range(width)])
    width = max(len(r) for r in rows)
    rows = [r + [''] * (width - len(r)) for r in rows]
    with open(dst, 'w', newline='') as f:
        csv.writer(f).writerows(rows)
    print(f'{src} -> {dst}: {len(rows)} rows x {width} cols')


if __name__ == '__main__':
    convert(sys.argv[1], sys.argv[2])
