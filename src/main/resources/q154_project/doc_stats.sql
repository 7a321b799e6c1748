-- graft: materialized=ephemeral
select doc_id, lang, source, loaded_batch, n_chars,
       length(text) as text_len
from {{ ref('raw_docs') }}
