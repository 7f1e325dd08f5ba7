"""Golden fixture texts — the only concrete input→expected pairs.

Texts are from the reference's test fixtures (modulo line-end whitespace,
which the clean stage strips)
(/root/reference/tests/__init__.py:67-116) and the captured end-to-end
input (/root/reference/scripts/text_client_workflow.py:45-56).  They seed
both the pytest equality suite and the deterministic transcript
synthesizer (sources/transcripts.py).
"""

from __future__ import annotations

GOLDEN_TEXTS: dict[str, str] = {
    "simple_product": """
        Açaí (Euterpe oleracea) is a palm tree native to Brazil, specifically
        from the Amazon rainforest region. The fruit is traditionally used by
        indigenous communities for food and medicinal purposes. It has gained
        commercial popularity as a superfood and is exported worldwide.
        """,
    "multiple_products": """
        In the Amazon region of Peru, several important bioeconomic products
        are harvested sustainably. Camu camu (Myrciaria dubia) contains high
        levels of vitamin C and is used for nutritional supplements.

        Cat's claw (Uncaria tomentosa) is a medicinal vine used traditionally
        for immune system support and is now commercialized globally.

        Brazil nut (Bertholletia excelsa) provides protein-rich seeds that
        are harvested by local communities and sold in international markets.
        """,
    "spanish_text": """
        La maca (Lepidium meyenii) es una planta originaria de los Andes
        peruanos que se cultiva tradicionalmente en las regiones altas.
        Se utiliza como alimento nutritivo y medicina tradicional para
        aumentar la energía y la fertilidad. Actualmente se exporta como
        suplemento dietético.
        """,
    "irrelevant_text": """
        The weather forecast for tomorrow shows a 30% chance of rain with
        temperatures ranging from 15 to 22 degrees Celsius. Traffic
        conditions on the main highway are expected to be heavy during
        rush hour. The local soccer team won their match yesterday.
        """,
    "mixed_content": """
        Economic development in rural Colombia has been enhanced through
        sustainable harvesting of natural products. Tagua (Phytelephas aequatorialis),
        known as vegetable ivory, is carved into buttons and decorative items.

        The weather has been favorable for agriculture this season, with
        adequate rainfall supporting crop growth. Local farmers also cultivate
        coffee and plantains for domestic consumption.

        Copaiba oil (Copaifera spp.) is extracted from trees in the region
        and used for medicinal and cosmetic applications.
        """,
    # scripts/text_client_workflow.py:45-56 — the captured real-run input
    "portuguese_report": """
    A região amazônica do Brasil é rica em produtos da sociobiodiversidade.
    O açaí (Euterpe oleracea) é amplamente consumido como alimento no Pará e Amapá,
    sendo também utilizado na fabricação de cosméticos.
    A castanha-do-pará (Bertholletia excelsa) é coletada de forma sustentável
    por comunidades tradicionais no Acre e Rondônia, sendo exportada como alimento nutritivo.
    Na Colômbia, a copaíba (Copaifera officinalis) é utilizada na medicina tradicional
    para tratamento de feridas e inflamações. No Peru, a maca (Lepidium meyenii)
    é consumida como alimento funcional e suplemento nutricional.
    O buriti (Mauritia flexuosa) é utilizado no Equador para artesanato,
    especialmente na confecção de cestas e chapéus tradicionais.
    """,
}

# Dirty variants exercise the clean chain byte-for-byte (FIXTURES.md §1.3):
# mojibake keys, control chars, whitespace runs, em dashes, ellipsis runs.
DIRTY_WRAPPERS: list[tuple[str, str]] = [
    # (prefix, suffix) injected around a golden text
    ("Reportâ€™s   findings\x0c follow:\n\n", "\n\nEnd â€œquotedâ€\x9d  –  fin...."),
    ("\x00\x01Ã¡Ã©Ã­ summary\t\t(draft)\r\n", "\n\n\n\nappendix Ã± Ã§ ....."),
    ("   leading  ws\n single\nwrapped\nlines ", "  trailing—dash\t\t "),
]

# HTML boilerplate wrapper (FIXTURES.md §1.4) — nav/footer link farms,
# script/style noise; the main-content strip must recover the golden text.
HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><title>Portal</title><style>body {{color: red}}</style>
<script>var tracking = "{key}"; trackEverything();</script></head>
<body>
<nav><a href="/">Home</a> | <a href="/products">Products</a> | <a href="/about">About</a> | <a href="/contact">Contact us today</a></nav>
<header><h1>Bio Portal</h1></header>
<div class="sidebar"><ul>
<li><a href="/l1">Related link one here</a></li>
<li><a href="/l2">Related link two here</a></li>
<li><a href="/l3">Related link three here</a></li>
</ul></div>
<div class="content"><p>{content}</p></div>
<footer><a href="/tos">Terms of service</a> | <a href="/privacy">Privacy policy page</a> | Copyright 2024 Bio Portal Inc</footer>
</body></html>"""


def html_wrap(content: str, key: str = "k") -> str:
    """Embed a text in the boilerplate template (single <p> main block)."""
    return HTML_TEMPLATE.format(content=content, key=key)
