from khmer_tpu.io import oxli_format
from khmer_tpu.io.fastx import FastxReader, Read, write_record
