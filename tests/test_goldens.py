"""Self-golden regression lock: the exact bytes every codec produces for
a fixed input are pinned by hash.  The reference's own outputs are the
compressed-size spec (matched exactly — see test_codecs size-parity);
these hashes freeze OUR byte streams so any drift in coder/model/
heuristic behavior is caught immediately."""

import hashlib

import pytest

import compressjs_tpu as cz

REF = '/root/reference/test'

# sha256 of compress_file(sample1.ref[:40000], level=7)
GOLDEN = {
    # re-pinned after the Lloyd-refinement encoder improvement (smaller
    # output, still standard-format: C bzip2 decodes it)
    'Bzip2': 'ce31a109bb36ef9dc04f3a05a0bc2ee14f32a474382a06d6993d9a5be05907bc',
    'BWTC': '845f3f5b4784669fc9a78e993a65ebcf03228defefb5960b8146800e62861c3f',
    'Lzjb': '28c86c95a5944f204cd45dd5634de6decbfd87ed682c179f22bd6f9a3e6728f2',
    'LzjbR': 'da02aa73c8f6235f4f8f6789bb2126d8ed95f88c1d2c10aa9a539feec955819d',
    'Lzp3': 'd130d9456b4a089406dcbcb40be0abe2acaf2236bc86f1eddf04fabedea75e09',
    'PPM': 'fc38b0db42201e1ebec59112d14aa7ebd352f837f09bdb9c403e381d3d1555a2',
    'Dmc': 'c627e48c70df9d90876469d2b8213355019bb8a17016e0ed1947d88b0717e57f',
    'Simple': '969891eb15db8aca30ace0c881ce8affe41663fcf2c9ce265d8231a71257b52b',
    'Huffman': '992083a35ae840358eb2181325725163308c32079bf184046253bc121c14700e',
    'MTFModel': 'e82dcd340cba7a023da54675cac12dfa639a69a9eabefd8acb41c3358b282e55',
    'FenwickModel': '09bcdfd2dd5bedd81410c1b57eb1feffdf3bd841f460fc6e0dc4ddd5cee1a717',
    'DefSumModel': '5fc1d19752aa63588b957116711b64e75bcd1b7effa92421414d2c23b749795e',
    'Context1Model': 'dc148bf41cee97939b08e527ea8c44e899c473556baefce1ddb325ac0b0f9058',
    'NoModel': '6fc84c5d43e460b748edfee909b11645a4e8b318ad4f192d4790c1e46bd0fc3f',
}


@pytest.mark.parametrize('name', sorted(GOLDEN))
def test_codec_output_pinned(name):
    data = open(f'{REF}/sample1.ref', 'rb').read()[:40000]
    comp = bytes(getattr(cz, name).compress_file(data, None, 7))
    assert hashlib.sha256(comp).hexdigest() == GOLDEN[name], name
